"""Merge standing sidecar metrics into accuracy/metrics.json + ACCURACY.json,
with provenance and staleness eviction (VERDICT r3 #5 / weak #2).

scripts/accuracy.sh rewrites $DIR/metrics.json from scratch on every run
(correctly — its WER/WDER must be provenance-pure for the evaluated
checkpoint), which drops standing numbers produced by the sibling loops
(scripts/uisrnn_der.sh -> uisrnn_metrics.json, cli.vad -> vad_metrics.json,
cli.sad -> sad_metrics.json, scripts/embed_chain.sh -> embed_metrics.json).
This folds every sidecar back in, subject to staleness rules:

  * the ASR base (wer/wder) is kept ONLY if its recorded checkpoint still
    exists on disk and its corpus tag matches the current corpus marker —
    round 3 published v1 numbers for a deleted checkpoint next to v2
    sidecars, which read as "aligned WDER is 0.0 on the current corpus";
  * embed_metrics.json (checkpoint-dependent) is dropped when older than
    avg_last_3.msgpack;
  * uisrnn_metrics.json (corpus-dependent) is dropped when older than the
    corpus marker;
  * vad/sad sidecars evaluate their own corpora and merge unconditionally.

Every surviving group is tagged in a `provenance` map (source file, corpus,
measured_at) so ACCURACY.json is self-describing.

Usage: python scripts/merge_metrics.py [ACC_DIR]
"""

import glob
import json
import os
import sys
import time


def _iso(t: float) -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(t))


def _corpus_tag(acc_dir: str):
    """(tag, marker_mtime) of the newest corpus marker, or (None, None)."""
    markers = sorted(glob.glob(os.path.join(acc_dir, "train", ".corpus_v*")))
    if not markers:
        return None, None
    return os.path.basename(markers[-1])[len(".corpus_"):], \
        os.path.getmtime(markers[-1])


def merge(acc_dir: str = "accuracy") -> dict:
    base_path = os.path.join(acc_dir, "metrics.json")
    root = os.path.dirname(os.path.abspath(acc_dir))
    corpus, corpus_mtime = _corpus_tag(acc_dir)
    avg_ckpt = os.path.join(acc_dir, "avg_last_3.msgpack")

    base, provenance = {}, {}
    if os.path.exists(base_path):
        cand = json.load(open(base_path))
        ck = cand.get("checkpoint")
        ck_ok = bool(ck) and os.path.exists(os.path.join(acc_dir, ck))
        corpus_ok = corpus is None or cand.get("corpus") == corpus
        if ck_ok and corpus_ok:
            base = cand
            provenance["asr"] = {
                "source": "metrics.json", "corpus": cand.get("corpus"),
                "checkpoint": ck, "measured_at": cand.get("measured_at")}
        else:
            print(f"merge_metrics: evicting stale ASR base "
                  f"(checkpoint_exists={ck_ok}, corpus_match={corpus_ok}, "
                  f"tagged corpus={cand.get('corpus')!r} vs live {corpus!r})",
                  file=sys.stderr)

    def sidecar(name: str, key: str, newer_than=None, corpus_tagged=False):
        p = os.path.join(acc_dir, name)
        if not os.path.exists(p):
            return
        mtime = os.path.getmtime(p)
        data = json.load(open(p))
        # Corpus-dependent sidecars may embed the tag of the (seeded,
        # deterministic) corpus they were measured on; a post-reboot
        # regeneration bumps the marker mtime without changing content, so
        # the tag comparison is the true staleness test when available.
        if corpus_tagged and "_corpus" in data:
            if corpus is not None and data["_corpus"] != corpus:
                print(f"merge_metrics: skipping stale sidecar {name} "
                      f"(corpus {data['_corpus']!r} vs live {corpus!r})",
                      file=sys.stderr)
                return
        elif newer_than is not None and mtime < newer_than:
            print(f"merge_metrics: skipping stale sidecar {name} "
                  f"(older than its dependency)", file=sys.stderr)
            return
        base.update({k: v for k, v in data.items() if not k.startswith("_")})
        provenance[key] = {"source": name, "measured_at": _iso(mtime)}

    # checkpoint-dependent: clustering WDER of the speaker-embedding chain
    sidecar("embed_metrics.json", "embed",
            newer_than=os.path.getmtime(avg_ckpt)
            if os.path.exists(avg_ckpt) else float("inf"))
    # corpus-dependent: UIS-RNN DER over features of the current corpus
    sidecar("uisrnn_metrics.json", "uisrnn", newer_than=corpus_mtime,
            corpus_tagged=True)
    # own-corpus sidecars
    sidecar("vad_metrics.json", "vad")
    sidecar("sad_metrics.json", "sad")
    sidecar("sad_stress_metrics.json", "sad_stress")

    base["provenance"] = provenance
    if corpus:
        base.setdefault("corpus", corpus)
    base["merged_at"] = _iso(time.time())
    json.dump(base, open(base_path, "w"), indent=1)
    json.dump(base, open(os.path.join(root, "ACCURACY.json"), "w"), indent=1)
    return base


if __name__ == "__main__":
    print(json.dumps(merge(*sys.argv[1:])))

"""Regression tests for the round-4 chain-ops fixes (ADVICE r3 + VERDICT r3).

Covers:
  * cli.train step-counter restore on same-run warm starts (ADVICE medium:
    params-only loads reset step to 0, renumbering retry checkpoints);
  * merge_metrics provenance + staleness eviction (VERDICT #5: round 3
    published corpus-v1 WER for a deleted checkpoint next to v2 sidecars);
  * SincConv half-Hamming window shape (ADVICE low: full-period sweep
    collapsed the window at the filter's center tap).
"""
import argparse
import json
import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _args(**kw):
    ns = argparse.Namespace(no_restore_step=False)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _state():
    from tal_asrd_tpu.train.system import TrainState

    return TrainState(step=jnp.zeros((), jnp.int32), params={}, opt_state={})


class TestRestoreStep:
    def test_same_run_ckpt_restores_step(self, tmp_path):
        from tal_asrd_tpu.cli.train import maybe_restore_step

        run = tmp_path / "ckpts" / "acc1x"
        run.mkdir(parents=True)
        ckpt = run / "ckpt_00001950.msgpack"
        args = _args(load=str(ckpt), checkpoint_path=str(tmp_path / "ckpts"),
                     name="acc1x")
        out = maybe_restore_step(args, _state())
        assert int(out.step) == 1950

    def test_cross_run_load_keeps_step_zero(self, tmp_path):
        """Curriculum hand-offs (p1c ckpt -> p2 run) must NOT inherit the
        donor phase's step count — the step budget is phase-relative."""
        from tal_asrd_tpu.cli.train import maybe_restore_step

        donor = tmp_path / "ckpts" / "acc1x-p1c" / "ckpt_00006000.msgpack"
        args = _args(load=str(donor), checkpoint_path=str(tmp_path / "ckpts"),
                     name="acc1x")
        assert int(maybe_restore_step(args, _state()).step) == 0

    def test_non_ckpt_name_keeps_step_zero(self, tmp_path):
        from tal_asrd_tpu.cli.train import maybe_restore_step

        args = _args(load=str(tmp_path / "ckpts" / "a" / "avg_last_3.msgpack"),
                     checkpoint_path=str(tmp_path / "ckpts"), name="a")
        assert int(maybe_restore_step(args, _state()).step) == 0

    def test_opt_out_flag(self, tmp_path):
        from tal_asrd_tpu.cli.train import maybe_restore_step

        args = _args(load=str(tmp_path / "ckpts" / "a" / "ckpt_00000100.msgpack"),
                     checkpoint_path=str(tmp_path / "ckpts"), name="a",
                     no_restore_step=True)
        assert int(maybe_restore_step(args, _state()).step) == 0


class TestMergeMetrics:
    def _corpus(self, acc, tag=".corpus_v2"):
        (acc / "train").mkdir(parents=True)
        (acc / "train" / tag).touch()

    def test_evicts_base_with_missing_checkpoint(self, tmp_path, monkeypatch):
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc)
        json.dump({"wer_pct": 35.3, "corpus": "v2",
                   "checkpoint": "avg_last_3.msgpack"},
                  open(acc / "metrics.json", "w"))
        out = merge_metrics.merge(str(acc))
        assert "wer_pct" not in out  # checkpoint file does not exist

    def test_evicts_base_with_corpus_mismatch(self, tmp_path):
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc, ".corpus_v3")
        (acc / "avg_last_3.msgpack").write_bytes(b"x")
        json.dump({"wer_pct": 35.3, "corpus": "v2",
                   "checkpoint": "avg_last_3.msgpack"},
                  open(acc / "metrics.json", "w"))
        out = merge_metrics.merge(str(acc))
        assert "wer_pct" not in out

    def test_keeps_live_base_and_tags_provenance(self, tmp_path):
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc)
        (acc / "avg_last_3.msgpack").write_bytes(b"x")
        json.dump({"wer_pct": 12.0, "corpus": "v2",
                   "checkpoint": "avg_last_3.msgpack",
                   "measured_at": "2026-08-18T00:00:00Z"},
                  open(acc / "metrics.json", "w"))
        json.dump({"vad_f1_pct": 96.8}, open(acc / "vad_metrics.json", "w"))
        out = merge_metrics.merge(str(acc))
        assert out["wer_pct"] == 12.0
        assert out["vad_f1_pct"] == 96.8
        assert out["provenance"]["asr"]["checkpoint"] == "avg_last_3.msgpack"
        assert "measured_at" in out["provenance"]["vad"]
        # published twice: acc dir + repo root
        assert json.load(open(tmp_path / "ACCURACY.json"))["wer_pct"] == 12.0

    def test_stale_embed_sidecar_skipped(self, tmp_path):
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc)
        json.dump({"embed_wder_pct": 9.9},
                  open(acc / "embed_metrics.json", "w"))
        old = os.path.getmtime(acc / "embed_metrics.json") - 100
        os.utime(acc / "embed_metrics.json", (old, old))
        (acc / "avg_last_3.msgpack").write_bytes(b"x")  # newer than sidecar
        out = merge_metrics.merge(str(acc))
        assert "embed_wder_pct" not in out

    def test_fresh_embed_sidecar_merged(self, tmp_path):
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc)
        (acc / "avg_last_3.msgpack").write_bytes(b"x")
        json.dump({"embed_wder_pct": 9.9},
                  open(acc / "embed_metrics.json", "w"))
        new = os.path.getmtime(acc / "avg_last_3.msgpack") + 100
        os.utime(acc / "embed_metrics.json", (new, new))
        out = merge_metrics.merge(str(acc))
        assert out["embed_wder_pct"] == 9.9

    def test_corpus_tagged_uisrnn_survives_marker_regeneration(self, tmp_path):
        """A post-reboot regeneration of the seeded corpus bumps the marker
        mtime without changing content; a `_corpus`-tagged sidecar must
        survive on tag equality (and the tag itself must not be published)."""
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc)  # marker mtime == now
        json.dump({"uisrnn_der_pct": 30.6, "_corpus": "v2"},
                  open(acc / "uisrnn_metrics.json", "w"))
        old = os.path.getmtime(acc / "train" / ".corpus_v2") - 100
        os.utime(acc / "uisrnn_metrics.json", (old, old))  # older than marker
        out = merge_metrics.merge(str(acc))
        assert out["uisrnn_der_pct"] == 30.6
        assert "_corpus" not in out

    def test_corpus_tagged_uisrnn_evicted_on_tag_mismatch(self, tmp_path):
        import merge_metrics

        acc = tmp_path / "accuracy"
        self._corpus(acc, ".corpus_v3")
        json.dump({"uisrnn_der_pct": 30.6, "_corpus": "v2"},
                  open(acc / "uisrnn_metrics.json", "w"))
        new = os.path.getmtime(acc / "train" / ".corpus_v3") + 100
        os.utime(acc / "uisrnn_metrics.json", (new, new))  # fresh by mtime
        out = merge_metrics.merge(str(acc))
        assert "uisrnn_der_pct" not in out  # tag comparison wins


class TestPersistSidecars:
    """Sidecar metric evidence must survive a reboot with the weights
    (VERDICT r4 #2 follow-through: r5 lost embed/uisrnn/vad/sad numbers when
    the gitignored tree was wiped, even though the checkpoint was durable)."""

    def test_sidecar_restore_roundtrip_preserves_mtime(self, tmp_path):
        import persist_ckpt

        rel = tmp_path / "release"
        (rel / "sidecars").mkdir(parents=True)
        (rel / "avg_last_3.bf16.msgpack").write_bytes(b"ckpt")
        json.dump({"source_mtime_epoch": 1787123506},
                  open(rel / "latest.json", "w"))
        side = rel / "sidecars" / "embed_metrics.json"
        json.dump({"cluster_wder_pct": 1.5}, open(side, "w"))
        os.utime(side, (1787130370,) * 2)

        acc = tmp_path / "accuracy"
        assert persist_ckpt.restore(str(acc), str(rel)) == 0
        # checkpoint restored with its true identity timestamp
        assert int(os.path.getmtime(acc / "avg_last_3.msgpack")) == 1787123506
        # sidecar restored with its original measured_at mtime
        restored = acc / "embed_metrics.json"
        assert json.load(open(restored))["cluster_wder_pct"] == 1.5
        assert int(os.path.getmtime(restored)) == 1787130370

    def test_restore_never_clobbers_live_files(self, tmp_path):
        import persist_ckpt

        rel = tmp_path / "release"
        (rel / "sidecars").mkdir(parents=True)
        (rel / "avg_last_3.bf16.msgpack").write_bytes(b"old")
        json.dump({"source_mtime_epoch": 1},
                  open(rel / "latest.json", "w"))
        json.dump({"cluster_wder_pct": 9.9},
                  open(rel / "sidecars" / "embed_metrics.json", "w"))
        acc = tmp_path / "accuracy"
        acc.mkdir()
        (acc / "avg_last_3.msgpack").write_bytes(b"live")
        json.dump({"cluster_wder_pct": 0.5},
                  open(acc / "embed_metrics.json", "w"))
        assert persist_ckpt.restore(str(acc), str(rel)) == 0
        assert (acc / "avg_last_3.msgpack").read_bytes() == b"live"
        assert json.load(
            open(acc / "embed_metrics.json"))["cluster_wder_pct"] == 0.5


class TestSincWindow:
    def test_half_hamming_rises_to_center(self):
        """The left half-window must increase monotonically toward the filter
        center and approach 1.0 there (ADVICE r3: a full-period cosine sweep
        peaked mid-half and fell to 0.08 at the center tap)."""
        from tal_asrd_tpu.vad.pyannet import SincConv

        sc = SincConv()
        k = sc.kernel_size
        half = (k - 1) // 2
        window = 0.54 - 0.46 * np.cos(
            2.0 * np.pi * np.linspace(0.0, k / 2.0 - 1.0, half) / k)
        assert np.all(np.diff(window) > 0)
        assert window[-1] > 0.95
        assert window[0] < 0.1  # Hamming foot at the filter edge


class TestSadStressCorpus:
    """SAD stress corpus (VERDICT r3 #8): noise floor + SNR sweep +
    distractors must remove the trivial energy separability of the plain
    synth corpus while keeping the TAL transcript schema."""

    def test_schema_and_snr_range(self, tmp_path):
        from tal_asrd_tpu.data.synth import build_sad_stress_corpus

        tr = build_sad_stress_corpus(str(tmp_path), n_episodes=1,
                                     episode_seconds=40.0, seed=1,
                                     snr_db=(0.0, 20.0))
        utts = tr["ep0"]
        assert len(utts) >= 3
        for u in utts:
            assert {"utterance", "speaker", "utterance_start",
                    "utterance_end", "role", "snr_db"} <= set(u)
            assert 0.0 <= u["snr_db"] <= 20.0
        assert os.path.exists(tmp_path / "ep0.wav")
        assert os.path.exists(tmp_path / "transcript.pkl")
        assert os.path.exists(tmp_path / "speaker_map.json")

    def test_not_energy_separable(self, tmp_path):
        """The best single energy threshold must misclassify a nontrivial
        fraction of frames (the plain corpus is ~99.9% separable)."""
        from tal_asrd_tpu.data.audio_io import load_audio_segment
        from tal_asrd_tpu.data.synth import build_sad_stress_corpus

        tr = build_sad_stress_corpus(str(tmp_path), n_episodes=2,
                                     episode_seconds=60.0, seed=0,
                                     snr_db=(0.0, 15.0))
        frame = 160  # 10 ms
        errs, total = 0, 0
        rms_all, lab_all = [], []
        for stub, utts in tr.items():
            wav = np.asarray(load_audio_segment(
                str(tmp_path / f"{stub}.wav"), 0.0, None))
            n = len(wav) // frame
            rms = np.sqrt((wav[:n * frame].reshape(n, frame) ** 2).mean(1))
            lab = np.zeros(n, bool)
            for u in utts:
                a = int(u["utterance_start"] * 100)
                b = int(u["utterance_end"] * 100)
                lab[a:min(b, n)] = True
            rms_all.append(rms)
            lab_all.append(lab)
        rms = np.concatenate(rms_all)
        lab = np.concatenate(lab_all)
        # sweep thresholds: best achievable frame accuracy of an energy gate
        best = max(
            ((rms > th) == lab).mean()
            for th in np.quantile(rms, np.linspace(0.01, 0.99, 99)))
        assert best < 0.97, f"energy gate still separates: acc={best:.4f}"
        # ...but speech is still louder on average (the task is possible)
        assert rms[lab].mean() > 1.2 * rms[~lab].mean()


class TestDeadlineGuardForcePublish:
    """Guard <-> chain interaction when the tunnel is dead all round.

    Round-4 hazard: deadline_guard's force-publish used to touch .done in
    the PRE-migration checkpoint dirs. The chain's first launch then moved
    acc1x aside and found acc1x-p2m marked done with zero checkpoints, so
    the final phase warm-started from --load "" in a watchdog relaunch
    loop — and the eval seed would have been the r3 LM-prior-basin acc1x
    checkpoint, the exact weights the round exists to retire.
    """

    def _sandbox(self, tmp_path):
        ck = tmp_path / "ckpts"
        (ck / "acc1x").mkdir(parents=True)
        (ck / "acc1x-p1c").mkdir()
        (ck / "acc1x" / "ckpt_00001950.msgpack").write_text("basin")
        (ck / "acc1x-p1c" / "ckpt_00006000.msgpack").write_text("p1c")
        return ck

    def _run(self, tmp_path):
        import subprocess

        root = os.path.join(os.path.dirname(__file__), "..")
        return subprocess.run(
            ["bash", "scripts/deadline_guard.sh", "--test-force-publish"],
            cwd=root, env={**os.environ, "ACC_DIR": str(tmp_path)},
            capture_output=True, text=True)

    def test_seeds_from_p1c_not_r3_basin(self, tmp_path):
        ck = self._sandbox(tmp_path)
        r = self._run(tmp_path)
        assert r.returncode == 0, r.stderr
        # migration happened: basin weights retired, marker written
        assert (ck / "r3-basin-acc1x" / "ckpt_00001950.msgpack").exists()
        assert (ck / ".r4_chain_v2").exists()
        # eval seed is the curriculum checkpoint, not the basin one
        seed = ck / "acc1x" / "ckpt_00000001.msgpack"
        assert seed.read_text() == "p1c"
        # every phase the chain checks is marked done, INCLUDING p2m (the
        # chain must then fall back to p1c instead of --load "")
        for ph in ("acc1x", "acc1x-p2m", "acc1x-p1c"):
            assert (ck / ph / ".done").exists()

    def test_idempotent_second_run(self, tmp_path):
        ck = self._sandbox(tmp_path)
        self._run(tmp_path)
        r = self._run(tmp_path)
        assert r.returncode == 0, r.stderr
        assert (ck / "acc1x" / "ckpt_00000001.msgpack").read_text() == "p1c"
        assert not (ck / "r3-basin-r3-basin-acc1x").exists()

    def test_chain_p2m_fallback_line_present(self):
        """The chain-side half of the contract: empty-but-done p2m must fall
        back to the p1c checkpoint (pinned textually; the chain needs a real
        corpus + chip to execute)."""
        root = os.path.join(os.path.dirname(__file__), "..")
        with open(os.path.join(root, "scripts", "r4_chain.sh")) as f:
            src = f.read()
        assert '[ -n "$P2M" ] || P2M=$P1C' in src


class TestP2mRetryDecision:
    """Decision-tree branch 1 automation (scripts/chain_decisions.py):
    the chain retries the bridge phase at LR 3e-4 ONLY when the CE probe
    shows the LM-prior basin, at most once, and never after the deadline
    guard has force-published."""

    def _run(self, acc):
        import subprocess

        root = os.path.join(os.path.dirname(__file__), "..")
        return subprocess.run(
            ["python", "scripts/chain_decisions.py", "p2m-retry", str(acc)],
            cwd=root, capture_output=True, text=True).returncode

    def _probe(self, acc, seg):
        import json

        (acc / "ckpts").mkdir(parents=True, exist_ok=True)
        (acc / "valsplit_p2m.json").write_text(
            json.dumps({"val_segment": seg, "val_aligned": 1.0}))

    def test_basin_triggers_retry(self, tmp_path):
        self._probe(tmp_path, 4.1)
        assert self._run(tmp_path) == 0

    def test_learned_bridge_skips(self, tmp_path):
        self._probe(tmp_path, 1.9)
        assert self._run(tmp_path) == 1

    def test_no_probe_skips(self, tmp_path):
        (tmp_path / "ckpts").mkdir(parents=True)
        assert self._run(tmp_path) == 1

    def test_retry_is_once(self, tmp_path):
        self._probe(tmp_path, 4.1)
        (tmp_path / "ckpts" / ".p2m_retry_done").write_text("")
        assert self._run(tmp_path) == 1

    def test_force_publish_blocks_retry(self, tmp_path):
        self._probe(tmp_path, 4.1)
        (tmp_path / "ckpts" / "acc1x").mkdir(parents=True)
        (tmp_path / "ckpts" / "acc1x" / ".done").write_text("")
        assert self._run(tmp_path) == 1

    def test_chain_calls_the_decision(self):
        root = os.path.join(os.path.dirname(__file__), "..")
        src = open(os.path.join(root, "scripts", "r4_chain.sh")).read()
        assert "chain_decisions.py p2m-retry" in src
        assert "3e-4" in src  # the retry LR

"""Merge standing sidecar metrics into accuracy/metrics.json + ACCURACY.json.

scripts/accuracy.sh rewrites $DIR/metrics.json from scratch on every run
(correctly — its WER/WDER must be provenance-pure for the evaluated
checkpoint), which drops standing numbers produced by the sibling loops
(scripts/uisrnn_der.sh -> uisrnn_metrics.json, cli.vad -> vad_metrics.json,
scripts/embed_chain.sh -> embed_metrics.json). This folds every sidecar back
in so the tracked ACCURACY.json carries the full regression surface that
bench.py publishes.

Usage: python scripts/merge_metrics.py [ACC_DIR]
"""

import json
import os
import sys

SIDECARS = ("uisrnn_metrics.json", "vad_metrics.json", "embed_metrics.json",
            "sad_metrics.json")


def merge(acc_dir: str = "accuracy") -> dict:
    base_path = os.path.join(acc_dir, "metrics.json")
    root = os.path.dirname(os.path.abspath(acc_dir))
    if os.path.exists(base_path):
        base = json.load(open(base_path))
    elif os.path.exists(os.path.join(root, "ACCURACY.json")):
        # no fresh accuracy.sh run yet — keep the standing headline numbers
        # and fold the new sidecars over them
        base = json.load(open(os.path.join(root, "ACCURACY.json")))
    else:
        base = {}
    for name in SIDECARS:
        p = os.path.join(acc_dir, name)
        if os.path.exists(p):
            base.update(json.load(open(p)))
    json.dump(base, open(base_path, "w"))
    json.dump(base, open(os.path.join(root, "ACCURACY.json"), "w"))
    return base


if __name__ == "__main__":
    print(json.dumps(merge(*sys.argv[1:])))

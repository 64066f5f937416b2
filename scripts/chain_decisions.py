"""Unattended-chain decisions, extracted so they are unit-testable.

The r4 chain (scripts/r4_chain.sh) runs overnight against a tunnel that
fails by hanging; every branch it takes must be testable on a laptop. Each
subcommand prints its verdict and exits 0 (take the branch) / 1 (don't).

    python scripts/chain_decisions.py p2m-retry [ACC_DIR]

p2m-retry — decision-tree branch 1 (ROADMAP "If p2m plateaus"): retry the
bridge phase from p1c at LR 3e-4 iff
  * the phase's post-hoc CE probe exists (accuracy/valsplit_p2m.json),
  * its segment CE is still in the LM-prior basin (> 3.5; a working bridge
    measures ~2, the basin ~4.0 — corpus-v2 unigram entropy),
  * the retry has not already been taken (.p2m_retry_done), and
  * the deadline guard has not force-published (acc1x/.done pre-exists:
    time is up, eval whatever exists instead of burning 1.5 h more).
"""
from __future__ import annotations

import json
import os
import sys

BASIN_SEGMENT_CE = 3.5


def p2m_retry(acc: str) -> int:
    vs = os.path.join(acc, "valsplit_p2m.json")
    if not os.path.exists(vs):
        print("p2m-retry: no CE probe; skip")
        return 1
    if os.path.exists(os.path.join(acc, "ckpts", ".p2m_retry_done")):
        print("p2m-retry: already retried; skip")
        return 1
    if os.path.exists(os.path.join(acc, "ckpts", "acc1x", ".done")):
        print("p2m-retry: force-published (deadline); skip")
        return 1
    try:
        seg = float(json.load(open(vs))["val_segment"])
    except Exception as e:
        print(f"p2m-retry: unreadable probe ({e}); skip")
        return 1
    if seg > BASIN_SEGMENT_CE:
        print(f"p2m-retry: segment CE {seg} > {BASIN_SEGMENT_CE} (basin); RETRY")
        return 0
    print(f"p2m-retry: segment CE {seg} <= {BASIN_SEGMENT_CE}; bridge learned")
    return 1


def main() -> int:
    cmd = sys.argv[1] if len(sys.argv) > 1 else ""
    acc = sys.argv[2] if len(sys.argv) > 2 else "accuracy"
    if cmd == "p2m-retry":
        return p2m_retry(acc)
    print(f"unknown decision {cmd!r}", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())

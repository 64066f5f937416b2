"""Append fused-kernel rows to PERF_SWEEP.jsonl after a kernel fix.

The main sweep (perf_sweep.sh) fail-fasts fused rows when every fused config
of the first batch dies (a Mosaic compile failure is shape-family-wide). When
the kernel is later fixed, re-running the WHOLE sweep would re-burn the
already-captured baseline rows — this helper runs only the requested fused
configs, appends rows in run_one's exact format, and re-summarizes into
PERF_BEST.json (same numerics gate: a fused row may only win if its
on-silicon greedy-token-match probe passed).

    python scripts/fused_rows.py --batch 128 --blocks 8,16 [--kv8] [--w8]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(batch: int, fused: int, blk: int, kv8: int, w8: int,
            out: str, timeout_s: int) -> dict:
    env = {**os.environ,
           "BENCH_BATCH": str(batch), "BENCH_FUSED": str(fused),
           "BENCH_FUSED_BLOCK": str(blk), "BENCH_FUSED_KV8": str(kv8),
           "BENCH_FUSED_W8": str(w8),
           "BENCH_SKIP_EXTRAS": "1", "BENCH_ITERS": "6"}
    print(f"--- batch={batch} fused={fused} block={blk} kv8={kv8} w8={w8}",
          file=sys.stderr, flush=True)
    base = {"batch": batch, "fused": fused, "fused_block": blk,
            "kv8": kv8, "w8": w8}
    # Compile-only pre-probe (VERDICT r4 #8): a Mosaic rejection of a new
    # kernel config costs one XLA compile, not the timed row's full timeout.
    if fused:
        pp = subprocess.run(
            [sys.executable, "bench.py"], cwd=ROOT,
            env={**env, "BENCH_COMPILE_ONLY": "1"},
            capture_output=True, text=True, timeout=timeout_s)
        if pp.returncode != 0 or '"ok": true' not in pp.stdout.lower():
            sys.stderr.write((pp.stderr or "")[-2000:] + "\n")
            row = {**base, "error": "compile probe failed"}
            with open(out, "a") as f:
                f.write(json.dumps(row) + "\n")
            return row
        print(f"    compile probe ok: {pp.stdout.strip().splitlines()[-1]}",
              file=sys.stderr, flush=True)
    try:
        p = subprocess.run([sys.executable, "bench.py"], cwd=ROOT, env=env,
                           capture_output=True, text=True, timeout=timeout_s)
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
        row = {**json.loads(line), **base}
    except Exception as e:
        sys.stderr.write(p.stderr[-2000:] + "\n" if "p" in dir() and p.stderr
                         else "")
        row = {**base, "error": f"bench failed: {type(e).__name__}"}
    with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")
    return row


def summarize(out: str, best_path: str) -> None:
    rows = [json.loads(l) for l in open(out)]
    ok = [r for r in rows
          if "value" in r and r.get("fused_greedy_token_match", True)]
    best = max(ok, key=lambda r: r["value"]) if ok else None
    print(json.dumps({"n_configs": len(rows), "best": best}, indent=1))
    if best:
        json.dump(best, open(best_path, "w"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--blocks", default="8,16")
    ap.add_argument("--kv8", action="store_true")
    ap.add_argument("--w8", action="store_true")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--out", default=os.path.join(ROOT, "PERF_SWEEP.jsonl"))
    ap.add_argument("--best", default=os.path.join(ROOT, "PERF_BEST.json"))
    args = ap.parse_args()

    # int8 rows run UNCONDITIONALLY (unlike perf_sweep's gate-on-base-win):
    # the VMEM budget at block 8 (weights ~7 MB bf16 + double-buffered
    # window K/V ~11 MB bf16) makes kv8/w8 the only configurations expected
    # to fit — a bf16 OOM must not suppress the configs designed to fix it.
    blocks = [int(b) for b in args.blocks.split(",")]
    for blk in blocks:
        r = run_one(args.batch, 1, blk, 0, 0, args.out, args.timeout)
        print(json.dumps(r))
    if args.kv8:
        print(json.dumps(run_one(args.batch, 1, blocks[0], 1, 0,
                                 args.out, args.timeout)))
    if args.w8:
        print(json.dumps(run_one(args.batch, 1, blocks[0], 0, 1,
                                 args.out, args.timeout)))
    if args.kv8 and args.w8:
        print(json.dumps(run_one(args.batch, 1, blocks[0], 1, 1,
                                 args.out, args.timeout)))
    summarize(args.out, args.best)


if __name__ == "__main__":
    main()

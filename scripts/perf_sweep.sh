#!/usr/bin/env bash
# Perf sweep on the real chip (VERDICT r2 #2): batch x fused-decode grid over
# the bench headline config, plus the per-stage profile. Writes one JSON line
# per config to PERF_SWEEP.jsonl and leaves the winner's settings in
# PERF_BEST.json for bench.py defaults to be updated by hand (deliberate —
# the default change should be a reviewed commit, not a side effect).
#
#   scripts/perf_sweep.sh            # full grid (~15-25 min on one v5e)
#   SWEEP_BATCHES="32 128" scripts/perf_sweep.sh
set -uo pipefail
cd "$(dirname "$0")/.."

BATCHES=${SWEEP_BATCHES:-"32 64 128 256"}
# Artifact paths are overridable so CPU smokes (tiny arch, interpret-mode
# kernels) can exercise the WHOLE script without clobbering the real chip
# artifacts the watchdog's perf_first gates on.
OUT=${SWEEP_OUT:-PERF_SWEEP.jsonl}
BEST=${SWEEP_BEST:-PERF_BEST.json}
: > "$OUT"

# Fused rows also grid the per-kernel batch block (VMEM residency knob): the
# 2x layer's weights + KV blocks at block 8 sit near the VMEM budget, so a
# single hardcoded block could OOM and silently lose every fused data point.
FUSED_BLOCKS=${SWEEP_FUSED_BLOCKS:-"4 8"}

run_one() {  # batch fused block kv8 w8
  local b=$1 fused=$2 blk=$3 kv8=${4:-0} w8=${5:-0}
  echo "--- batch=$b fused=$fused block=$blk kv8=$kv8 w8=$w8" >&2
  # Compile-only pre-probe (VERDICT r4 #8): a Mosaic rejection of a new
  # fused config costs one XLA compile, not a timed row's 900 s timeout.
  if [ "$fused" = 1 ]; then
    if ! BENCH_BATCH=$b BENCH_FUSED=1 BENCH_FUSED_BLOCK=$blk \
         BENCH_FUSED_KV8=$kv8 BENCH_FUSED_W8=$w8 BENCH_COMPILE_ONLY=1 \
         timeout 600 python bench.py >/dev/null; then
      echo "    compile probe FAILED; skipping timed row" >&2
      echo "{\"batch\": $b, \"fused\": $fused, \"fused_block\": $blk, \"kv8\": $kv8, \"w8\": $w8, \"error\": \"compile probe failed\"}" >> "$OUT"
      return
    fi
  fi
  local line
  line=$(BENCH_BATCH=$b BENCH_FUSED=$fused BENCH_FUSED_BLOCK=$blk \
         BENCH_FUSED_KV8=$kv8 BENCH_FUSED_W8=$w8 \
         BENCH_SKIP_EXTRAS=1 BENCH_ITERS=6 timeout 900 python bench.py \
         | tail -1)
  if [ -n "$line" ]; then
    # Row travels via env, NOT stdin: `python - <<heredoc` consumes stdin as
    # the script, so a piped row is never readable (ADVICE r3, high — every
    # sweep row was silently dropped).
    ROW="$line" python -c '
import json, os, sys
row = json.loads(os.environ["ROW"])
row["batch"] = int(sys.argv[1]); row["fused"] = int(sys.argv[2])
row["fused_block"] = int(sys.argv[3]); row["kv8"] = int(sys.argv[4])
row["w8"] = int(sys.argv[5])
print(json.dumps(row))
' "$b" "$fused" "$blk" "$kv8" "$w8" >> "$OUT" \
      || echo "{\"batch\": $b, \"fused\": $fused, \"fused_block\": $blk, \"kv8\": $kv8, \"w8\": $w8, \"error\": \"row parse failed\"}" >> "$OUT"
  else
    echo "{\"batch\": $b, \"fused\": $fused, \"fused_block\": $blk, \"kv8\": $kv8, \"w8\": $w8, \"error\": \"bench failed\"}" >> "$OUT"
  fi
}

summarize() {
  SWEEP_OUT="$OUT" SWEEP_BEST="$BEST" python - <<'PY'
import json, os
rows = [json.loads(l) for l in open(os.environ["SWEEP_OUT"])]
# a fused/kv8/w8 row may only win if its on-silicon numerics gate passed
ok = [r for r in rows
      if "value" in r and r.get("fused_greedy_token_match", True)]
best = max(ok, key=lambda r: r["value"]) if ok else None
print(json.dumps({"n_configs": len(rows), "best": best}, indent=1))
if best:
    json.dump(best, open(os.environ["SWEEP_BEST"], "w"))
PY
}

# Fail-fast on a fused-kernel compile failure: if EVERY fused row of the
# first batch errors, later batches will too (Mosaic compile failures are
# shape-family-wide, and per-block VMEM depends on the block size, not the
# batch count) — skip them instead of burning a 900 s timeout per row.
fused_ok=0
first_batch=1
for b in $BATCHES; do
  run_one "$b" 0 8 0
  if [ "$fused_ok" = 1 ] || [ "$first_batch" = 1 ]; then
    for blk in $FUSED_BLOCKS; do
      run_one "$b" 1 "$blk" 0
      tail -1 "$OUT" | grep -q '"error"' || fused_ok=1
    done
    [ "$first_batch" = 1 ] && [ "$fused_ok" = 0 ] \
      && echo "--- every fused row failed at batch $b; skipping fused rows for later batches" >&2
  fi
  first_batch=0
done
summarize

# int8 extensions (kv8: cross-K/V, the decode step's dominant HBM read;
# w8: decoder weights, the next-largest stream): only spend chip time on
# them if a fused row won the base grid — both ride on the fused kernel, so
# they cannot win where fused itself loses. Token-agreement and
# logit-maxdiff gates ride in each row (bench numerics probe).
if [ -f "$BEST" ] && \
   python -c 'import json,sys; sys.exit(0 if json.load(open(sys.argv[1])).get("fused")==1 else 1)' "$BEST"; then
  BB=$(python -c 'import json,sys; print(json.load(open(sys.argv[1]))["batch"])' "$BEST")
  BLK=$(python -c 'import json,sys; print(json.load(open(sys.argv[1]))["fused_block"])' "$BEST")
  run_one "$BB" 1 "$BLK" 1 0    # kv8
  run_one "$BB" 1 "$BLK" 0 1    # w8
  run_one "$BB" 1 "$BLK" 1 1    # kv8 + w8
  summarize
fi

#!/usr/bin/env bash
# Fire the round-3 perf work the moment the training chain releases the chip
# (chip-idle gaps on a single tunneled TPU are pure waste; the chain can take
# hours and sessions get interrupted).
#
#   scripts/r3_perf_watch.sh <chain_pid>
#
# Steps once the chain exits:
#   1. per-stage decode profile -> PERF_PROFILE.json (VERDICT r2 weak #2/#4)
#   2. batch x fused sweep      -> PERF_SWEEP.jsonl + PERF_BEST.json
set -uo pipefail
cd "$(dirname "$0")/.."

PID=${1:?usage: r3_perf_watch.sh <chain_pid>}
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "chain $PID exited; starting perf work at $(date)"

python scripts/profile_decode.py --batches 32,64,128 --json-out PERF_PROFILE.json \
  || echo "profile_decode failed"
bash scripts/perf_sweep.sh || echo "perf_sweep failed"
echo "perf work done at $(date)"

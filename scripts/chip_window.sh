#!/usr/bin/env bash
# Borrow the chip from the training chain for a bounded evidence window,
# then hand it back — the round's perf follow-ups (fused-kernel rows after
# the Mosaic fixes, the grouped-conv micro-benchmark) need exclusive chip
# time, and the chain+watchdog are designed to absorb exactly this kind of
# interruption (idempotent phases, warm-start from newest ckpt, probe-gated
# relaunch).
#
#   bash scripts/chip_window.sh            # default evidence set
#   WINDOW_CMDS=custom.sh bash scripts/chip_window.sh
#
# Sequence: SIGSTOP the watchdog (so it cannot relaunch), kill the chain's
# process tree by recorded pid (never by pattern), run the evidence
# commands, SIGCONT the watchdog — it probes the tunnel and relaunches the
# chain, which resumes from the newest checkpoint (<=ckpt-every epochs of
# lost work).
set -uo pipefail
cd "$(dirname "$0")/.."

LEDGER=accuracy/chain
WD=$(cat "$LEDGER/watchdog.pid" 2>/dev/null || true)
CH=$(cat "$LEDGER/chain.pid" 2>/dev/null || true)

descendants() {
  local queue=("$1") out=()
  while [ ${#queue[@]} -gt 0 ]; do
    local pid=${queue[0]}; queue=("${queue[@]:1}")
    local kids
    kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
    for k in $kids; do out+=("$k"); queue+=("$k"); done
  done
  echo "${out[@]:-}"
}

t0=$(date +%s)
echo "[window] open at $(date -u +%H:%M:%S)"
if [ -n "$WD" ] && kill -0 "$WD" 2>/dev/null; then
  kill -STOP "$WD"
  echo "[window] watchdog $WD paused"
fi
if [ -n "$CH" ] && kill -0 "$CH" 2>/dev/null; then
  D=$(descendants "$CH")
  kill "$CH" $D 2>/dev/null; sleep 8
  for p in $CH $D; do kill -0 "$p" 2>/dev/null && kill -9 "$p" 2>/dev/null; done
  echo "[window] chain $CH (+ $D) stopped"
fi
sleep 5   # let the TPU runtime release the exclusive slot

rc=0
if [ -n "${WINDOW_CMDS:-}" ]; then
  bash "$WINDOW_CMDS" || rc=$?
else
  # Default evidence set (each step fail-soft so the window always closes):
  # 1. fused rows on silicon (post-Mosaic-fix; numerics gates ride in-row)
  timeout 3000 python scripts/fused_rows.py --batch 256 --blocks 8,16 \
      --kv8 --w8 || echo "[window] fused_rows failed"
  # 2. dispatch-corrected shootout: frontend fft/dft, grouped-conv
  #    lowerings, full-encode combos
  timeout 2400 python scripts/enc_microbench.py --batch 32 \
      --variants xla,packed10 \
      --json-out ENC_MICROBENCH.json || echo "[window] enc_microbench failed"
fi

if [ -n "$WD" ]; then
  kill -CONT "$WD" 2>/dev/null && echo "[window] watchdog resumed"
fi
echo "[window] closed after $(( ($(date +%s) - t0) / 60 )) min (rc=$rc)"

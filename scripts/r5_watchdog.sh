#!/usr/bin/env bash
# Keep scripts/r5_chain.sh alive across axon-tunnel hangs (the r3/r4 failure
# mode: the TPU client blocks forever on a dead tunnel RPC — 0 CPU, no file
# progress, never exits — which no exit-code retry inside the chain can see).
#
#   nohup bash scripts/r5_watchdog.sh > accuracy/chain/r5_watchdog.log 2>&1 &
#
# Loop:
#   * chain alive + python child + no chain-file progress for the phase's
#     stall limit -> kill that child (tree-resolved exact PID; every phase
#     warm-starts from its newest checkpoint, so nothing is lost)
#   * chain dead without success -> relaunch (all phases idempotent)
#   * success ("r5 chain done" in the ledger) or terminal gate-fail (exit 2
#     recorded) -> exit
#   * MAX_HOURS cap frees the chip for the driver's end-of-round bench.
# Never uses pattern kills: targets are resolved by walking the process tree
# under the chain PID this script launched.
set -u
cd "$(dirname "$0")/.."

TRAIN_STALL_MIN=${TRAIN_STALL_MIN:-15}
EVAL_STALL_MIN=${EVAL_STALL_MIN:-60}
POLL_S=${POLL_S:-60}
DIR=${ACC_DIR:-accuracy}
MAX_HOURS=${MAX_HOURS:-5}
LEDGER="$DIR/chain/r5_chain.log"
PIDFILE="$DIR/chain/r5_chain.pid"

deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

newest_mtime() {
  find "$DIR" -type f -not -name '*.txt' -not -path '*/diarfeat/*' \
      -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

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

chain_success() {
  grep -q "r5 chain done" "$LEDGER" 2>/dev/null \
    || grep -q "CE gate FAILED (p3pe-sa" "$LEDGER" 2>/dev/null
}

launch() {
  nohup bash scripts/r5_chain.sh >> "$DIR/chain/r5_chain_stdout.log" 2>&1 &
  CHAIN_PID=$!
  echo "$CHAIN_PID" > "$PIDFILE"
  echo "[r5_watchdog] launched chain pid $CHAIN_PID at $(date -u +%H:%M:%S)"
}

CHAIN_PID=$(cat "$PIDFILE" 2>/dev/null || echo "")

while :; do
  if chain_success; then
    echo "[r5_watchdog] chain reached a terminal state at $(date)"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "[r5_watchdog] MAX_HOURS=$MAX_HOURS exceeded; stopping the chain to free the chip"
    if [ -n "$CHAIN_PID" ] && kill -0 "$CHAIN_PID" 2>/dev/null; then
      for p in $(descendants "$CHAIN_PID"); do kill "$p" 2>/dev/null; done
      kill "$CHAIN_PID" 2>/dev/null
    fi
    break
  fi

  if [ -n "$CHAIN_PID" ] && kill -0 "$CHAIN_PID" 2>/dev/null; then
    py=""
    kind=""
    for p in $(descendants "$CHAIN_PID"); do
      cmd=$(tr '\0' ' ' < "/proc/$p/cmdline" 2>/dev/null || true)
      case "$cmd" in
        python*tal_asrd_tpu.cli.train*) py=$p; kind=train ;;
        python*tal_asrd_tpu*|python*val_split*) [ -z "$py" ] && { py=$p; kind=eval; } ;;
      esac
    done
    if [ -n "$py" ]; then
      now=$(date +%s)
      last=$(newest_mtime); last=${last:-0}
      age_min=$(( (now - last) / 60 ))
      lim=$TRAIN_STALL_MIN
      [ "$kind" = eval ] && lim=$EVAL_STALL_MIN
      child_min=$(( $(ps -o etimes= -p "$py" 2>/dev/null || echo 0) / 60 ))
      if [ "$age_min" -ge "$lim" ] && [ "$child_min" -ge "$lim" ]; then
        echo "[r5_watchdog] $kind child $py stalled ${age_min}min (limit ${lim}); killing it at $(date)"
        kill "$py" 2>/dev/null; sleep 10
        kill -0 "$py" 2>/dev/null && kill -9 "$py" 2>/dev/null
      fi
    fi
  else
    echo "[r5_watchdog] chain not running and not terminal; (re)launching at $(date)"
    launch
  fi
  sleep "$POLL_S"
done
echo "[r5_watchdog] exiting at $(date)"

#!/usr/bin/env bash
# Keep the round-3 training chain alive across axon-tunnel HANGS, then run
# the perf follow-ups. r3_chain.sh already retries on nonzero exits, but the
# failure mode observed tonight is different: the TPU client blocks forever
# on a dead tunnel RPC (0 CPU, no file progress, never exits), which no
# exit-code retry can see. This watchdog supplies the missing signal.
#
#   nohup bash scripts/chain_watchdog.sh > /tmp/chain_watchdog.log 2>&1 &
#
# Loop:
#   * chain alive + python child in a TRAIN phase + no file progress for
#     TRAIN_STALL_MIN  -> kill that child (tree-resolved exact PID; the chain
#     retries from the phase's latest checkpoint — writes are atomic)
#   * same for EVAL phases with the longer EVAL_STALL_MIN (a single unaligned
#     full-episode dispatch can legitimately block the client for a while)
#   * chain dead without the success condition -> relaunch it (all phases are
#     idempotent / warm-start, so this is safe and loses no work)
#   * success (metrics.json + embed_metrics.json newer than avg_last_3) ->
#     run profile_decode + perf_sweep + deviation_budget, then exit
#
# Never uses pattern kills: targets are resolved strictly by walking the
# process tree under the chain PID we launched.
set -u
cd "$(dirname "$0")/.."

TRAIN_STALL_MIN=${TRAIN_STALL_MIN:-15}
EVAL_STALL_MIN=${EVAL_STALL_MIN:-90}
POLL_S=${POLL_S:-60}
DIR=${ACC_DIR:-accuracy}
MAX_HOURS=${MAX_HOURS:-10}

deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

newest_mtime() {  # newest mtime (epoch s) across CHAIN-written files only.
  # Sidecar loops (scripts/uisrnn_der.sh tee-ing uisrnn_out.txt, diarfeat
  # extraction) also write under $DIR and would otherwise keep this fresh
  # while the train child hangs on a dead tunnel RPC — blinding the stall
  # detector exactly when a tunnel recovery needs a child restart.
  find "$DIR" -type f -not -name '*.txt' -not -path '*/diarfeat/*' \
      -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

descendants() {  # all descendant PIDs of $1, via ppid walk
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
  [ -f "$DIR/avg_last_3.msgpack" ] \
    && [ -f "$DIR/metrics.json" ] \
    && [ -f "$DIR/embed_metrics.json" ] \
    && [ "$DIR/metrics.json" -nt "$DIR/avg_last_3.msgpack" ] \
    && [ "$DIR/embed_metrics.json" -nt "$DIR/avg_last_3.msgpack" ]
}

CHAIN_PID=$(cat /tmp/r3_chain.pid 2>/dev/null || echo "")

while :; do
  if chain_success; then
    echo "[watchdog] chain succeeded at $(date)"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    echo "[watchdog] MAX_HOURS=$MAX_HOURS exceeded at $(date); giving up on the chain"
    break
  fi

  if [ -n "$CHAIN_PID" ] && kill -0 "$CHAIN_PID" 2>/dev/null; then
    # chain alive: stall-check its python child
    py=""
    kind=""
    for p in $(descendants "$CHAIN_PID"); do
      cmd=$(tr '\0' ' ' < "/proc/$p/cmdline" 2>/dev/null || true)
      case "$cmd" in
        python*tal_asrd_tpu.cli.train*) py=$p; kind=train ;;
        python*tal_asrd_tpu*) [ -z "$py" ] && { py=$p; kind=eval; } ;;
      esac
    done
    if [ -n "$py" ]; then
      now=$(date +%s)
      last=$(newest_mtime); last=${last:-0}
      age_min=$(( (now - last) / 60 ))
      lim=$TRAIN_STALL_MIN
      [ "$kind" = eval ] && lim=$EVAL_STALL_MIN
      # Grace period: a fresh child legitimately writes nothing while it
      # loads data + compiles; judge staleness only once the child itself is
      # older than the limit.
      child_min=$(( $(ps -o etimes= -p "$py" 2>/dev/null || echo 0) / 60 ))
      if [ "$age_min" -ge "$lim" ] && [ "$child_min" -ge "$lim" ]; then
        echo "[watchdog] $kind child $py stalled ${age_min}min (limit ${lim}); killing it at $(date)"
        kill "$py" 2>/dev/null; sleep 10
        kill -0 "$py" 2>/dev/null && kill -9 "$py" 2>/dev/null
      fi
    fi
  else
    echo "[watchdog] chain not running and not successful; relaunching at $(date)"
    nohup bash scripts/r3_chain.sh >> /tmp/r3_chain.log 2>&1 &
    CHAIN_PID=$!
    echo "$CHAIN_PID" > /tmp/r3_chain.pid
  fi
  sleep "$POLL_S"
done

if chain_success; then
  echo "[watchdog] starting perf follow-ups at $(date)"
  timeout 3600 python scripts/profile_decode.py --batches 32,64,128 \
      --json-out PERF_PROFILE.json || echo "[watchdog] profile_decode failed"
  timeout 7200 bash scripts/perf_sweep.sh || echo "[watchdog] perf_sweep failed"
  timeout 5400 python scripts/deviation_budget.py --episodes 2 \
      > DEVIATION_BUDGET.txt 2>&1 || echo "[watchdog] deviation_budget failed"
  echo "[watchdog] all follow-ups done at $(date)"
fi

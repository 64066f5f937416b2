#!/usr/bin/env bash
# Round-4 chain supervisor. Differences from the r3 watchdog, each fixing a
# measured failure of the 2026-08-17 overnight tunnel outage (VERDICT r3):
#
#   1. BACKEND-AWARE (VERDICT #6): before (re)launching a chip workload, probe
#      the tunnel with a hard-timeout `jax.devices()` one-liner. While it
#      fails, back off PROBE_BACKOFF_S without burning a 15-min child cycle
#      (the r3 watchdog kill-relaunch cycled a hung child ~12 times over 5 h).
#      Outage start/end are logged so lost chip-hours are accountable.
#      The probe runs ONLY when nothing else owns the chip: a probe against
#      the exclusive single-chip slot can steal it from a recovering trainer.
#
#   2. PERF-EVIDENCE-FIRST (VERDICT #1): the moment the tunnel is up, capture
#      the round's perf artifacts (per-stage profile, batch x fused sweep,
#      bench snapshot) BEFORE any training. ~1 h of chip time buys the whole
#      perf story; a resumed chain buys nothing if the tunnel dies again at
#      hour 6. Artifacts are committed immediately.
#
#   3. LEDGER OUT OF /tmp (VERDICT #10): pidfiles, logs, and outage spans live
#      under accuracy/chain/ (gitignored with the rest of accuracy/), so a
#      reboot cannot orphan the resume decision from the checkpoints.
#
# Launch:  nohup bash scripts/r4_watchdog.sh > accuracy/chain/watchdog.log 2>&1 &
#          echo $! > accuracy/chain/watchdog.pid
set -u
cd "$(dirname "$0")/.."

LEDGER=accuracy/chain
mkdir -p "$LEDGER"

TRAIN_STALL_MIN=${TRAIN_STALL_MIN:-15}
EVAL_STALL_MIN=${EVAL_STALL_MIN:-90}
POLL_S=${POLL_S:-60}
PROBE_BACKOFF_S=${PROBE_BACKOFF_S:-300}
# A HEALTHY tunnel's first jax.devices() in a fresh process takes ~2 min
# (tunnel warm-up; verify SKILL.md gotchas) — every probe is a fresh
# process, so a timeout below that declares a recovered tunnel dead forever.
PROBE_TIMEOUT_S=${PROBE_TIMEOUT_S:-240}
DIR=${ACC_DIR:-accuracy}
MAX_HOURS=${MAX_HOURS:-10}

deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

log() { echo "[watchdog] $* at $(date -u +%H:%M:%S)"; }

probe() {  # 0 = tunnel up. Hard timeout: the axon failure mode is a HANG.
  # Must assert the platform, not just non-empty devices: when the axon
  # plugin errors (the BENCH_r03 mode) JAX can fall back to CPU, and a
  # CPU-satisfied probe would run the whole perf chain on the host.
  timeout "$PROBE_TIMEOUT_S" python -c \
    "import jax; assert any(d.platform == 'tpu' for d in jax.devices())" \
    >/dev/null 2>&1
}

tunnel_wait() {  # block until the tunnel answers; log the outage span
  probe && return 0
  local t0=$(date +%s)
  log "tunnel DOWN; outage logged, backing off ${PROBE_BACKOFF_S}s per probe"
  echo "outage_start $(date -u +%FT%TZ)" >> "$LEDGER/outages.log"
  while ! probe; do
    [ "$(date +%s)" -ge "$deadline" ] && return 1
    sleep "$PROBE_BACKOFF_S"
  done
  local mins=$(( ($(date +%s) - t0) / 60 ))
  echo "outage_end $(date -u +%FT%TZ) (${mins} min observed)" >> "$LEDGER/outages.log"
  log "tunnel UP after ${mins} min outage"
}

git_commit_artifacts() {  # $1 = message, rest = files (commit only if new)
  local msg=$1; shift
  local have=()
  for f in "$@"; do [ -f "$f" ] && have+=("$f"); done
  [ ${#have[@]} -eq 0 ] && return 0
  git add "${have[@]}" 2>/dev/null
  git diff --cached --quiet || git commit -m "$msg" \
    -m "No-Verification-Needed: unattended artifact capture by scripts/r4_watchdog.sh" \
    || log "commit failed (index lock?); artifacts remain on disk"
}

perf_first() {  # VERDICT #1: perf artifacts before training, each gated
  # profile_decode writes incrementally; "complete": true marks a full grid.
  # A partial file (tunnel died mid-grid) is kept as evidence but re-run.
  # Commit each artifact AS IT LANDS: if the deadline guard (or a second
  # outage) kills this mid-sweep, the finished pieces must already be in git.
  if ! grep -q '"complete": true' PERF_PROFILE.json 2>/dev/null; then
    log "perf: profile_decode"
    timeout 2700 python scripts/profile_decode.py --batches 32,64,128 \
        --json-out PERF_PROFILE.json || log "profile_decode failed"
    git_commit_artifacts \
      "Per-stage decode profile from the real chip" PERF_PROFILE.json
  fi
  if [ ! -f PERF_BEST.json ]; then
    log "perf: batch x fused sweep"
    timeout 7200 bash scripts/perf_sweep.sh || log "perf_sweep failed"
    git_commit_artifacts \
      "Batch x fused-kernel sweep from the real chip" \
      PERF_SWEEP.jsonl PERF_BEST.json
  fi
  if [ ! -f BENCH_SELF.json ]; then
    log "perf: bench snapshot"
    timeout 2400 python bench.py > BENCH_SELF.json 2> "$LEDGER/bench_self.err" \
      || { log "bench snapshot failed"; rm -f BENCH_SELF.json; }
  fi
  git_commit_artifacts \
    "Perf evidence from the real chip: per-stage decode profile, batch x fused-kernel sweep, bench snapshot" \
    PERF_PROFILE.json PERF_SWEEP.jsonl PERF_BEST.json BENCH_SELF.json
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

newest_mtime() {  # newest mtime (epoch s) across CHAIN-written files only
  find "$DIR" -type f -not -name '*.txt' -not -path '*/diarfeat/*' \
      -not -path "*/chain/*" \
      -printf '%T@\n' 2>/dev/null | sort -n | tail -1 | cut -d. -f1
}

chain_success() {
  [ -f "$DIR/avg_last_3.msgpack" ] \
    && [ -f "$DIR/metrics.json" ] \
    && [ -f "$DIR/embed_metrics.json" ] \
    && [ "$DIR/metrics.json" -nt "$DIR/avg_last_3.msgpack" ] \
    && [ "$DIR/embed_metrics.json" -nt "$DIR/avg_last_3.msgpack" ]
}

# ---------------------------------------------------------------------------
tunnel_wait || { log "deadline hit while tunnel down; exiting"; exit 1; }
perf_first

CHAIN_PID=$(cat "$LEDGER/chain.pid" 2>/dev/null || echo "")

while :; do
  if chain_success; then
    log "chain succeeded"
    break
  fi
  if [ "$(date +%s)" -ge "$deadline" ]; then
    log "MAX_HOURS=$MAX_HOURS exceeded; giving up on the chain"
    break
  fi

  if [ -n "$CHAIN_PID" ] && kill -0 "$CHAIN_PID" 2>/dev/null; then
    # chain alive: stall-check its python child (the hang failure mode)
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
      child_min=$(( $(ps -o etimes= -p "$py" 2>/dev/null || echo 0) / 60 ))
      if [ "$age_min" -ge "$lim" ] && [ "$child_min" -ge "$lim" ]; then
        log "$kind child $py stalled ${age_min}min (limit ${lim}); killing it"
        kill "$py" 2>/dev/null; sleep 10
        kill -0 "$py" 2>/dev/null && kill -9 "$py" 2>/dev/null
      fi
    fi
  else
    # chain not running: probe BEFORE relaunching (the r3 failure: each blind
    # relaunch burned a 15-min hung-child cycle all night)
    tunnel_wait || { log "deadline hit while tunnel down; exiting"; exit 1; }
    log "relaunching chain"
    # RETRIES=1: a killed/hung child ends the chain so control returns HERE,
    # where the probe gates the relaunch — the chain's blind internal retry
    # loop is the wrong place to wait out a tunnel outage.
    RETRIES=1 nohup bash scripts/r4_chain.sh >> "$LEDGER/chain.log" 2>&1 &
    CHAIN_PID=$!
    echo "$CHAIN_PID" > "$LEDGER/chain.pid"
  fi
  sleep "$POLL_S"
done

if chain_success; then
  log "post-chain follow-ups"
  git_commit_artifacts \
    "Corpus-v2 accuracy: aligned + unaligned WER/WDER + embed-chain clustering WDER from one checkpoint" \
    ACCURACY.json
  if [ ! -f DEVIATION_BUDGET.txt ]; then
    timeout 5400 python scripts/deviation_budget.py --episodes 2 \
        > DEVIATION_BUDGET.txt 2>&1 || log "deviation_budget failed"
    git_commit_artifacts \
      "Deviation-B budget at production scale: evict-block 64 vs 1 divergence on trained model, full episodes" \
      DEVIATION_BUDGET.txt
  fi
  # trained-weights bench snapshot (3b leg now has a real checkpoint)
  timeout 2400 python bench.py > BENCH_SELF.json 2>> "$LEDGER/bench_self.err" \
    && git_commit_artifacts "Bench snapshot on trained weights (unaligned 3b leg live)" BENCH_SELF.json
  log "all follow-ups done"
fi

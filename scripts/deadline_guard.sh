#!/usr/bin/env bash
# Round-end guard for the unattended r3 chain (single exclusive TPU chip,
# axon tunnel that fails by hanging). Two tripwires, both by absolute UTC
# wall-clock, designed to guarantee the round still publishes artifacts even
# if the overnight tunnel outage eats most of the training budget:
#
#   PUBLISH_AT (default 04:00): if phase p2 (acc1x) hasn't finished, mark the
#     training phases done (they have checkpoints) and kill the in-flight
#     train child so the relaunched/continuing chain goes straight to the
#     eval legs — a real ACCURACY.json from a partially-trained checkpoint
#     beats no update at all.
#
#   FREE_AT (default 06:55): kill the watchdog, the chain, and every
#     descendant so the chip is free for the driver's end-of-round bench.
#
# PIDs are resolved strictly by tree walks from recorded pidfiles — never by
# pattern match.
set -u
cd "$(dirname "$0")/.."

PUBLISH_AT=${PUBLISH_AT:-04:00}
FREE_AT=${FREE_AT:-06:55}
ACC=${ACC_DIR:-accuracy}
LEDGER=$ACC/chain

chain_pidfile() {  # r4 ledger first, /tmp fallback (r3 compatibility)
  if [ -f "$LEDGER/chain.pid" ]; then echo "$LEDGER/chain.pid";
  else echo /tmp/r3_chain.pid; fi
}
watchdog_pidfile() {
  if [ -f "$LEDGER/watchdog.pid" ]; then echo "$LEDGER/watchdog.pid";
  else echo /tmp/watchdog.pid; fi
}

epoch_today_or_tomorrow() {  # HH:MM -> epoch s (next occurrence)
  local t
  t=$(date -d "today $1" +%s)
  [ "$t" -le "$(date +%s)" ] && t=$(date -d "tomorrow $1" +%s)
  echo "$t"
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

kill_train_child() {  # kill only the cli.train descendant of the chain
  local chain
  chain=$(cat "$(chain_pidfile)" 2>/dev/null) || return 0
  for p in $(descendants "$chain"); do
    local cmd
    cmd=$(tr '\0' ' ' < "/proc/$p/cmdline" 2>/dev/null || true)
    case "$cmd" in
      python*tal_asrd_tpu.cli.train*)
        echo "[deadline] killing train child $p"
        kill "$p" 2>/dev/null; sleep 5
        kill -0 "$p" 2>/dev/null && kill -9 "$p" 2>/dev/null ;;
    esac
  done
}

force_publish() {  # $1 = "kill" to also kill the in-flight train child
  # Mark every r4 train phase done so the relaunched chain goes straight to
  # the eval legs. If the final phase (acc1x) has no checkpoint yet, seed it
  # with the newest ckpt of the furthest-along curriculum phase — a real
  # ACCURACY.json from a partially-trained checkpoint beats no update.
  #
  # Replicate the chain's version migration FIRST: if the chain never
  # launched (tunnel dead all round), $ACC/ckpts/acc1x still holds the
  # r3 LM-prior-basin weights — seeding the eval legs from those would
  # publish numbers for the exact failure mode this round exists to fix,
  # and the chain's later move would orphan the .done markers we touch here
  # (empty p2m marked done -> --load "" crash loop).
  if [ ! -f "$ACC/ckpts/.r4_chain_v2" ]; then
    for d in acc1x acc1x-p2a; do
      [ -d "$ACC/ckpts/$d" ] && mv "$ACC/ckpts/$d" "$ACC/ckpts/r3-basin-$d"
    done
    touch "$ACC/ckpts/.r4_chain_v2"
  fi
  local newest="" ph
  # p1b/p1 included since the r4 reboot-bootstrap: after the wipe the chain
  # retrains from scratch, so the furthest phase may be a short-task one.
  for ph in acc1x acc1x-p2m acc1x-p1c acc1x-p1b acc1x-p1; do
    newest=$(ls -t "$ACC/ckpts/$ph"/ckpt_*.msgpack 2>/dev/null | head -1 || true)
    [ -n "$newest" ] && break
  done
  if [ -n "$newest" ]; then
    echo "[deadline] $PUBLISH_AT reached with training unfinished; forcing eval legs (seed: $newest)"
    mkdir -p "$ACC/ckpts/acc1x"
    if ! ls "$ACC/ckpts/acc1x"/ckpt_*.msgpack >/dev/null 2>&1; then
      cp "$newest" "$ACC/ckpts/acc1x/ckpt_00000001.msgpack"
    fi
    for ph in acc1x acc1x-p2m acc1x-p1c acc1x-p1b acc1x-p1; do
      mkdir -p "$ACC/ckpts/$ph"; touch "$ACC/ckpts/$ph/.done"
    done
    [ "${1:-}" = kill ] && kill_train_child
  else
    echo "[deadline] $PUBLISH_AT reached but NO phase has checkpoints; leaving chain alone"
  fi
}

# Test hook (regression: tests/test_chain_ops.py): run the force-publish
# decision once against ACC_DIR, no waiting, no process kills, then exit.
if [ "${1:-}" = "--test-force-publish" ]; then
  force_publish nokill
  exit 0
fi

PUB_T=$(epoch_today_or_tomorrow "$PUBLISH_AT")
FREE_T=$(epoch_today_or_tomorrow "$FREE_AT")

# --- tripwire 1: force-publish ---------------------------------------------
while [ "$(date +%s)" -lt "$PUB_T" ]; do
  [ -f "$ACC/ckpts/acc1x/.done" ] && break
  sleep 120
done
[ -f "$ACC/ckpts/acc1x/.done" ] || force_publish kill

# --- tripwire 2: free the chip ----------------------------------------------
while [ "$(date +%s)" -lt "$FREE_T" ]; do sleep 60; done
echo "[deadline] $FREE_AT reached; freeing the chip for the end-of-round bench"
WD=$(cat "$(watchdog_pidfile)" 2>/dev/null || true)
CH=$(cat "$(chain_pidfile)" 2>/dev/null || true)
for root in $WD $CH; do
  [ -n "$root" ] || continue
  kids=$(descendants "$root")
  kill "$root" 2>/dev/null
  for p in $kids; do kill "$p" 2>/dev/null; done
  sleep 5
  for p in $root $kids; do kill -0 "$p" 2>/dev/null && kill -9 "$p" 2>/dev/null; done
done
echo "[deadline] done at $(date)"

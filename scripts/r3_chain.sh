#!/usr/bin/env bash
# Round-3 accuracy training chain, restartable across TPU-tunnel crashes.
#
#   phase p1c : short-task adaptation (max-secs 10) of the p1b checkpoint to
#               the bucket-safe masked log-mel frontend (commit ea6b274 —
#               features are now occupancy-independent, so the old weights
#               must re-adapt before long-window training).
#   phase p2  : long multi-utterance shiftaug windows (28.5 s ~ the 357-frame
#               unaligned decode chunk) — the round-2 VERDICT #1 fix.
#   eval      : scripts/accuracy.sh (aligned + unaligned WER/WDER)
#               -> scripts/embed_chain.sh -> merge_metrics.py.
#
# Each train phase retries up to $RETRIES times on a nonzero exit (the axon
# tunnel sporadically kills the TPU worker mid-run); a retry warm-starts from
# the latest checkpoint the phase already wrote, so no chip time is lost.
set -uo pipefail
cd "$(dirname "$0")/.."

RETRIES=${RETRIES:-4}

phase_done() {  # name max_steps
  # A phase is complete when it has a success marker, or its newest ckpt hit
  # the step target. Both are needed: params-only loads reset the trainer's
  # step counter, so (a) a relaunched chain would otherwise RE-TRAIN finished
  # phases from their own final weights, and (b) a phase finished on a RESUMED
  # attempt writes renumbered ckpts that never reach the nominal target.
  [ -f "accuracy/ckpts/$1/.done" ] && return 0
  local latest step
  latest=$(ls -v "accuracy/ckpts/$1"/ckpt_*.msgpack 2>/dev/null | tail -1 || true)
  [ -n "$latest" ] || return 1
  step=$(basename "$latest" .msgpack); step=$((10#${step#ckpt_}))
  [ "$step" -ge "$2" ]
}

train_phase() {  # name load_ckpt max_secs max_steps extra...
  local name=$1 load=$2 secs=$3 steps=$4; shift 4
  local attempt=0
  while :; do
    if phase_done "$name" "$steps"; then
      echo "phase $name complete; skipping"
      touch "accuracy/ckpts/$name/.done"
      return 0
    fi
    local cur="$load"
    local latest
    # Warm-start from the NEWEST ckpt by mtime (ADVICE r3, medium): step
    # numbering is monotonic again now that cli.train restores the step
    # counter on same-run loads, but mtime ordering stays correct even over
    # dirs holding pre-fix renumbered generations.
    latest=$(ls -t "accuracy/ckpts/$name"/ckpt_*.msgpack 2>/dev/null | head -1 || true)
    [ -n "$latest" ] && cur="$latest"
    if python -m tal_asrd_tpu.cli.train \
      --train-data accuracy/train --valid-data accuracy/valid \
      --tokenizer accuracy/bpe.model --model-type 1x --num-speakers 8 \
      --batch-size 16 --max-secs "$secs" --num-workers 0 --lr 2e-4 \
      --max-epochs 1000 --max-steps "$steps" --ckpt-every 5 \
      --load "$cur" --no-specaug --cache-items --audio-int16 \
      --name "$name" --checkpoint-path accuracy/ckpts \
      --out-dir accuracy/out-train "$@"; then
      touch "accuracy/ckpts/$name/.done"
      return 0
    fi
    attempt=$((attempt + 1))
    [ "$attempt" -ge "$RETRIES" ] && { echo "phase $name failed after $RETRIES attempts"; return 1; }
    echo "phase $name attempt $attempt failed; retrying in 60s from latest ckpt"
    sleep 60
  done
}

set -x
# Stale-ckpt guard: the resume logic warm-starts from the latest ckpt in the
# phase dir, so dirs left over from PREVIOUS chains must be moved aside once
# (marker file scoped to this chain version).
if [ ! -f accuracy/ckpts/.r3_chain_v1 ]; then
  for d in acc1x acc1x-p1c; do
    [ -d "accuracy/ckpts/$d" ] && mv "accuracy/ckpts/$d" "accuracy/ckpts/pre-r3chain-$d"
  done
  touch accuracy/ckpts/.r3_chain_v1
fi

# p1b's final ckpt by mtime, not a hardcoded step (ADVICE r3: early stopping
# can end p1b below the nominal step target, making a hardcoded name vanish).
P1B=$(ls -t accuracy/ckpts/acc1x-p1b/ckpt_*.msgpack | head -1)
train_phase acc1x-p1c "$P1B" 10 6000 || exit 1
P1C=$(ls -t accuracy/ckpts/acc1x-p1c/ckpt_*.msgpack | head -1)
train_phase acc1x "$P1C" 28.5 10000 --shiftaug || exit 1
bash scripts/accuracy.sh && bash scripts/embed_chain.sh && python scripts/merge_metrics.py accuracy

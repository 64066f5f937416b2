#!/usr/bin/env bash
# Round-4 accuracy training chain: MULTI-UTTERANCE BRIDGE for the unaligned
# task (supersedes both r3's direct hand-off and the window-length-annealing
# plan — measured per-token CE localized the actual defect).
#
# Round-4 diagnosis (per-token teacher-forced CE of the p1c model on segment
# windows, 2026-08-18): utterance-1 tokens score near-aligned CE, but every
# post-EOS continuation is a near-impossible event that ESCALATES per
# utterance (CE 38 -> 69 by utterance 3). Aligned training (num_utterances=1)
# only ever showed [EOS text spk EOS] with nothing after the final EOS, so
# the model learned EOS as terminal; the first shiftaug batches then hit
# CE ~14 (worse than the 3.9 unigram floor), and the fastest descent
# direction is "ignore audio, predict the LM prior" — the measured basin
# (val_segment pinned at 4.0, val_aligned dragged 0.61 -> 2.54). Window
# LENGTH was never the problem: r3's 14 s phase plateaued identically.
#
# Lever: phase p2m trains on EXACT-ALIGNED multi-utterance windows
# (AlignedDataset num_utterances=4, <=28.5 s, no truncation): the one new
# skill — continue past EOS — is taught with clean supervision at full
# window length. The shiftaug phase then adds only boundary truncation and
# window offsets (the TDS encoder is translation-invariant) at halved LR.
# The final phase keeps the r3 name `acc1x` (accuracy.sh / deadline_guard
# key off it).
#
# All phases are idempotent (.done + step-target markers), warm-start from
# their own newest ckpt on retry (cli.train restores the step counter for
# same-run loads, so numbering stays monotonic), and survive kill-relaunch.
set -uo pipefail
cd "$(dirname "$0")/.."

RETRIES=${RETRIES:-4}
# ACC_DIR: sandboxable so the control flow is testable (tests/test_chain_flow
# drives this script with stubbed training against a tmp dir). Production
# default is the real accuracy/ tree.
ACC=${ACC_DIR:-accuracy}

phase_done() {  # name max_steps
  [ -f "$ACC/ckpts/$1/.done" ] && return 0
  local latest step
  latest=$(ls -v "$ACC/ckpts/$1"/ckpt_*.msgpack 2>/dev/null | tail -1 || true)
  [ -n "$latest" ] || return 1
  step=$(basename "$latest" .msgpack); step=$((10#${step#ckpt_}))
  [ "$step" -ge "$2" ]
}

train_phase() {  # name load_ckpt max_secs max_steps lr extra...
  local name=$1 load=$2 secs=$3 steps=$4 lr=$5; shift 5
  local attempt=0
  while :; do
    if phase_done "$name" "$steps"; then
      echo "phase $name complete; skipping"
      touch "$ACC/ckpts/$name/.done"
      return 0
    fi
    local cur="$load"
    local latest
    latest=$(ls -t "$ACC/ckpts/$name"/ckpt_*.msgpack 2>/dev/null | head -1 || true)
    [ -n "$latest" ] && cur="$latest"
    if python -m tal_asrd_tpu.cli.train \
      --train-data $ACC/train --valid-data $ACC/valid \
      --tokenizer $ACC/bpe.model --model-type 1x --num-speakers 8 \
      --batch-size 16 --max-secs "$secs" --num-workers 0 --lr "$lr" \
      --max-epochs 1000 --max-steps "$steps" --ckpt-every 5 \
      --load "$cur" --no-specaug --cache-items --audio-int16 \
      --name "$name" --checkpoint-path $ACC/ckpts \
      --out-dir $ACC/out-train "$@"; then
      touch "$ACC/ckpts/$name/.done"
      return 0
    fi
    attempt=$((attempt + 1))
    [ "$attempt" -ge "$RETRIES" ] && { echo "phase $name failed after $RETRIES attempts"; return 1; }
    echo "phase $name attempt $attempt failed; retrying in 60s from latest ckpt"
    sleep 60
  done
}

valsplit() {  # phase_name ckpt — cheap post-phase accuracy evidence
  # Per-distribution teacher-forced CE (scripts/val_split.py) right after a
  # phase finishes, published to the TRACKED VALSPLIT_r4.json immediately:
  # the eval legs behind it take 1-2 h and the deadline guard can cut them,
  # but a 2-5 min CE probe always lands. Bridge success = segment CE well
  # below the ~4.0 LM-prior basin without aligned CE regressing.
  local phase=$1 ckpt=$2 out="$ACC/valsplit_$1.json"
  [ -n "$ckpt" ] || return 0
  if [ ! -f "$out" ] || [ "$ckpt" -nt "$out" ]; then
    timeout 900 python scripts/val_split.py "$ckpt" --acc-dir "$ACC" \
      --max-secs 28.5 --batches 8 > "$out" || { rm -f "$out"; return 0; }
  fi
  ACC="$ACC" python - <<'PY'
import glob, json, os, subprocess
acc = os.environ["ACC"]
res = {}
for f in sorted(glob.glob(f"{acc}/valsplit_*.json")):
    name = f.split("valsplit_")[1][:-5]
    try:
        res[name] = json.load(open(f))
    except Exception:
        continue
res["commit"] = subprocess.run(
    ["git", "rev-parse", "--short", "HEAD"],
    capture_output=True, text=True).stdout.strip()
# sandboxed runs keep their artifact inside the sandbox
dst = "VALSPLIT_r4.json" if acc == "accuracy" else f"{acc}/VALSPLIT_r4.json"
json.dump(res, open(dst, "w"), indent=1)
PY
  # Publish only for the production tree — a sandboxed flow test must not
  # commit its fake CE numbers to the repo.
  [ "$ACC" = accuracy ] || return 0
  git add VALSPLIT_r4.json 2>/dev/null
  git diff --cached --quiet || git commit \
    -m "Real-scale per-distribution CE after phase $phase" \
    -m "No-Verification-Needed: unattended artifact capture by scripts/r4_chain.sh" \
    || echo "valsplit commit failed (index lock?); artifact remains on disk"
}

set -x
# Self-bootstrap (2026-08-18 reboot wiped the gitignored accuracy/ tree):
# regenerate corpus v2 + BPE if missing (lock-guarded, CPU-pinned, may
# already be pre-warmed by a parallel session).
bash scripts/ensure_corpus.sh || exit 1

# Chain-version guard: the r3 direct-28.5s acc1x ckpts (and its 14s p2a
# experiment) live in the LM-prior basin — warm-starting from them would
# defeat the bridge. Move them aside once.
if [ ! -f $ACC/ckpts/.r4_chain_v2 ]; then
  for d in acc1x acc1x-p2a; do
    [ -d "$ACC/ckpts/$d" ] && mv "$ACC/ckpts/$d" "$ACC/ckpts/r3-basin-$d"
  done
  touch $ACC/ckpts/.r4_chain_v2
fi

# Short-task bootstrap phases (r3's measured recipe, accuracy.sh lines
# 79-111: p1 at LR 4e-4 then a fresh 2e-4 cycle as p1b — linear decay kills
# the LR while val is still falling, so the restart continues the descent).
# phase_done short-circuits these when round-3 checkpoints survive; after
# the reboot they start from scratch. Early stopping (patience 10) can end
# either phase below the nominal step target — the .done marker covers that.
train_phase acc1x-p1 "" 10 14000 4e-4 || exit 1
P1=$(ls -t $ACC/ckpts/acc1x-p1/ckpt_*.msgpack | head -1)
train_phase acc1x-p1b "$P1" 10 12000 2e-4 || exit 1

# p1c: short-task adaptation continues (val 0.61 in r3). Source it from
# p1b's newest ckpt by mtime. 12000 steps + patience 30: the 2026-08-18
# from-scratch run reached only val 1.27 by p1's end and p1b early-stopped
# at 1320/12000 (the fresh LR cycle transiently worsens val and the default
# patience 10 bailed), so p1c carries the remaining short-task descent.
P1B=$(ls -t $ACC/ckpts/acc1x-p1b/ckpt_*.msgpack | head -1)
train_phase acc1x-p1c "$P1B" 10 12000 2e-4 --patience 30 || exit 1
P1C=$(ls -t $ACC/ckpts/acc1x-p1c/ckpt_*.msgpack | head -1)

# Bridge: exact-aligned multi-utterance windows (EOS-continuation skill)
# LR is retry-marker-aware so a crash-relaunch RESUMES the retried phase at
# the retry's LR instead of silently dropping back to 1e-4.
P2M_LR=1e-4
[ -f $ACC/ckpts/.p2m_retry_done ] && P2M_LR=3e-4
train_phase acc1x-p2m "$P1C" 28.5 3000 "$P2M_LR" --num-utterances 4 || exit 1
P2M=$(ls -t $ACC/ckpts/acc1x-p2m/ckpt_*.msgpack 2>/dev/null | head -1 || true)
valsplit p2m "$P2M"

# Decision-tree branch 1 (ROADMAP "If p2m plateaus"), automated: if p2m's
# segment CE is still in the LM-prior basin (~4.0; threshold 3.5 — a working
# bridge measures ~2 or below), restart the phase ONCE from p1c at LR 3e-4
# with fresh optimizer state (the p1b->p1c trick that worked in r3). The
# basin run's ckpts and CE stay on disk as the diagnosis evidence. Skipped
# when the deadline guard has force-published (acc1x/.done pre-exists:
# time is up, eval whatever we have) and after one retry (.p2m_retry_done).
if python scripts/chain_decisions.py p2m-retry "$ACC"; then
  echo "p2m stuck in the LM-prior basin; one retry from p1c at LR 3e-4"
  touch $ACC/ckpts/.p2m_retry_done
  mv $ACC/ckpts/acc1x-p2m $ACC/ckpts/p2m-lr1e4-basin
  mv $ACC/valsplit_p2m.json $ACC/valsplit_p2m_lr1e4.json
  train_phase acc1x-p2m "$P1C" 28.5 3000 3e-4 --num-utterances 4 || exit 1
  P2M=$(ls -t $ACC/ckpts/acc1x-p2m/ckpt_*.msgpack 2>/dev/null | head -1 || true)
  valsplit p2m "$P2M"
fi
# A force-published .done (deadline_guard) can mark p2m done with zero ckpts
# (tunnel never came up); fall back to p1c rather than --load "" crashing.
[ -n "$P2M" ] || P2M=$P1C
# Long shiftaug windows, multi-utterance aligned items kept in the mix
train_phase acc1x "$P2M" 28.5 5000 1e-4 --shiftaug --num-utterances 4 || exit 1
valsplit acc1x "$(ls -t $ACC/ckpts/acc1x/ckpt_*.msgpack 2>/dev/null | head -1 || true)"

# Test hook: the flow test stops before the multi-hour eval legs.
[ "${CHAIN_SKIP_EVAL:-0}" = 1 ] && { echo "CHAIN_SKIP_EVAL=1: stopping before eval legs"; exit 0; }
bash scripts/accuracy.sh && bash scripts/embed_chain.sh \
  && python scripts/merge_metrics.py "$ACC"

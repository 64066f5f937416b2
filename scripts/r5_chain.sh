#!/usr/bin/env bash
# r5 posenc chain: carry the successful p3probe forward to a published number.
#
# Evidence behind this chain (accuracy/out-train/p3probe.metrics.jsonl):
# gated memory positional encoding (core/config.py enc_posenc, commit 76fb262)
# warm-started from p1c reached val 3.547 in 600 steps on the 4-utterance
# bridge task — below the ~3.82 floor where BOTH r4 p2m LR arms stalled
# (VALSPLIT_r4.json) — and its chain-log generation is a correct gold prefix
# instead of the degenerate babble the r4 bridge produced. This script:
#
#   A. p3pe      continue from the probe ckpt, 3000 steps @ 3e-4, on the
#                anti-forgetting mix (--num-utterances 1,4: short task stays
#                in-distribution while continuation trains)
#   B. p3pe-sa   polish on shift-augmented windows @ 1e-4 (the measured
#                acc1x recipe, accuracy.sh lines 120-131), same mix
#   C. gate      per-distribution CE (scripts/val_split.py --enc-posenc),
#                relative to the incumbent (valsplit_acc1x.json: segment
#                3.5617 / aligned 2.3829): adopt only if segment CE improves
#                and aligned CE gives back < GATE_AL_SLACK
#   D. publish   avg_last_3 <- avg of the phase's last 3; rerun the eval legs
#                with ACC_TEST_FLAGS="--enc-posenc $R5_DECODE_FLAGS"; adopt
#                only if unaligned WDER does not regress AND unaligned WER
#                gives back < GATE_WER_SLACK (WDER is the reference's
#                headline speaker-attributed metric, wder_search.py:320-445;
#                the r5 decode sweep showed its best config trades -4.7 WDER
#                for +0.65 WER, so a WER-only gate discards real wins).
#                Rejection restores the backup checkpoint+metrics and moves
#                the rejected decode outputs aside. Adoption runs
#                scripts/persist_ckpt.py so the winner is reboot-durable
#                (VERDICT r4 #2) and commits the artifacts.
#
# C+D run as a STAGED publish after EACH training phase (not only at the
# end): the round deadline is uncertain, and a gate-passing phase-A model
# must land a published number even if phase B never finishes.
#
# Resumable: phases skip when their step target is already on disk
# (phase_done), training warm-starts from the newest own ckpt on retry, and
# the eval legs inside accuracy.sh are skip-if-fresh. Safe to relaunch.
set -uo pipefail

ACC=${ACC_DIR:-accuracy}
R5_DECODE_FLAGS=${R5_DECODE_FLAGS:-}
GATE_SEG_MARGIN=${R5_GATE_SEG_MARGIN:-0.0}   # must beat incumbent by this
GATE_AL_SLACK=${R5_GATE_AL_SLACK:-0.2}       # aligned CE giveback allowed
RETRIES=${RETRIES:-4}
LEDGER="$ACC/chain/r5_chain.log"
mkdir -p "$ACC/chain"
note() { echo "[r5_chain $(date -u +%H:%M:%S)] $*" | tee -a "$LEDGER"; }

phase_done() {  # name max_steps
  [ -f "$ACC/ckpts/$1/.done" ] && return 0
  local latest step
  latest=$(ls -v "$ACC/ckpts/$1"/ckpt_*.msgpack 2>/dev/null | tail -1 || true)
  [ -n "$latest" ] || return 1
  step=$(basename "$latest" .msgpack); step=$((10#${step#ckpt_}))
  [ "$step" -ge "$2" ]
}

train_phase() {  # name load_ckpt max_steps lr extra...
  local name=$1 load=$2 steps=$3 lr=$4; shift 4
  local attempt=0
  while :; do
    if phase_done "$name" "$steps"; then
      note "phase $name complete; skipping"
      touch "$ACC/ckpts/$name/.done"
      return 0
    fi
    local cur="$load" latest
    latest=$(ls -t "$ACC/ckpts/$name"/ckpt_*.msgpack 2>/dev/null | head -1 || true)
    [ -n "$latest" ] && cur="$latest"
    note "phase $name: training from $cur (target $steps steps @ lr $lr)"
    if python -m tal_asrd_tpu.cli.train \
      --train-data "$ACC/train" --valid-data "$ACC/valid" \
      --tokenizer "$ACC/bpe.model" --model-type 1x --num-speakers 8 \
      --batch-size 16 --max-secs 28.5 --num-workers 0 --lr "$lr" \
      --max-epochs 1000 --max-steps "$steps" --ckpt-every 5 \
      --load "$cur" --no-specaug --cache-items --audio-int16 \
      --enc-posenc --num-utterances 1,4 \
      --name "$name" --checkpoint-path "$ACC/ckpts" \
      --out-dir "$ACC/out-train" "$@"; then
      touch "$ACC/ckpts/$name/.done"
      return 0
    fi
    attempt=$((attempt + 1))
    [ "$attempt" -ge "$RETRIES" ] && { note "phase $name FAILED after $RETRIES attempts"; return 1; }
    note "phase $name attempt $attempt failed; retrying in 60s"
    sleep 60
  done
}

GATE_WER_SLACK=${R5_GATE_WER_SLACK:-1.0}     # unaligned WER giveback allowed

ce_gate() {  # tag: valsplit avg_<tag> vs incumbent -> pass/fail
  local tag=$1
  python -m tal_asrd_tpu.cli.tools average-ckpt \
      --ckpt-dir "$ACC/ckpts/$tag" --last-k 3 --out "$ACC/avg_$tag.msgpack" \
      || return 1
  if [ ! -f "$ACC/valsplit_$tag.json" ] \
     || [ "$ACC/avg_$tag.msgpack" -nt "$ACC/valsplit_$tag.json" ]; then
    timeout 1800 python scripts/val_split.py "$ACC/avg_$tag.msgpack" \
        --acc-dir "$ACC" --max-secs 28.5 --batches 8 --enc-posenc \
        > "$ACC/valsplit_$tag.json" || { note "valsplit($tag) errored"; return 1; }
  fi
  cat "$ACC/valsplit_$tag.json" | tee -a "$LEDGER"
  local gate
  gate=$(python - "$ACC" "$tag" "$GATE_SEG_MARGIN" "$GATE_AL_SLACK" <<'PY'
import json, sys
acc, tag, margin, slack = sys.argv[1], sys.argv[2], float(sys.argv[3]), float(sys.argv[4])
v = json.load(open(f"{acc}/valsplit_{tag}.json"))
try:
    inc = json.load(open(f"{acc}/valsplit_acc1x.json"))
except Exception:
    inc = {"val_segment": 3.5617, "val_aligned": 2.3829}  # r5 measured
ok = (v["val_segment"] <= inc["val_segment"] - margin
      and v["val_aligned"] <= inc["val_aligned"] + slack)
print("pass" if ok else "fail")
PY
)
  [ "$gate" = pass ]
}

publish_stage() {  # tag: avg_<tag> -> eval legs -> WDER/WER gate -> adopt|restore
  local tag=$1
  local prev_wer prev_wder
  prev_wer=$(python -c "import json;print(json.load(open('$ACC/metrics.json')).get('unaligned_wer_pct',1e9))" 2>/dev/null || echo 1e9)
  prev_wder=$(python -c "import json;print(json.load(open('$ACC/metrics.json')).get('unaligned_wder_pct',1e9))" 2>/dev/null || echo 1e9)
  cp -p "$ACC/avg_last_3.msgpack" "$ACC/avg_r5_prev.msgpack" 2>/dev/null || true
  cp -p "$ACC/metrics.json" "$ACC/metrics_r5_prev.json" 2>/dev/null || true
  cp "$ACC/avg_$tag.msgpack" "$ACC/avg_last_3.msgpack"

  if ! ACC_TEST_FLAGS="--enc-posenc $R5_DECODE_FLAGS" bash scripts/accuracy.sh; then
    note "eval legs failed ($tag) — restoring pre-stage checkpoint/metrics"
    mv "$ACC/out-test" "$ACC/out-test-$tag-failed" 2>/dev/null || true
    mv "$ACC/out-test-aligned" "$ACC/out-test-aligned-$tag-failed" 2>/dev/null || true
    cp -p "$ACC/avg_r5_prev.msgpack" "$ACC/avg_last_3.msgpack"
    cp -p "$ACC/metrics_r5_prev.json" "$ACC/metrics.json"
    return 1
  fi
  local new_wer new_wder
  new_wer=$(python -c "import json;print(json.load(open('$ACC/metrics.json')).get('unaligned_wer_pct',1e9))")
  new_wder=$(python -c "import json;print(json.load(open('$ACC/metrics.json')).get('unaligned_wder_pct',1e9))")
  note "$tag unaligned: WER $prev_wer -> $new_wer, WDER $prev_wder -> $new_wder"
  if python -c "import sys; sys.exit(0 if (float('$new_wder') <= float('$prev_wder') and float('$new_wer') <= float('$prev_wer') + float('$GATE_WER_SLACK')) else 1)"; then
    note "ADOPTED $tag checkpoint"
    ACC_TEST_FLAGS="--enc-posenc $R5_DECODE_FLAGS" bash scripts/embed_chain.sh || note "embed chain failed (non-fatal)"
    python scripts/merge_metrics.py "$ACC"
    python scripts/persist_ckpt.py || note "persist failed (non-fatal)"
    git add ACCURACY.json accuracy_release 2>/dev/null || true
    git diff --cached --quiet || git commit \
      -m "Adopt $tag checkpoint: posenc chain publish (unaligned WER $prev_wer -> $new_wer, WDER $prev_wder -> $new_wder)" \
      -m "No-Verification-Needed: unattended artifact capture by scripts/r5_chain.sh" \
      || true
    return 0
  fi
  note "REJECTED $tag: unaligned WDER $prev_wder -> $new_wder / WER $prev_wer -> $new_wer (slack $GATE_WER_SLACK) — restoring"
  mv "$ACC/out-test" "$ACC/out-test-$tag-rejected" 2>/dev/null || true
  mv "$ACC/out-test-aligned" "$ACC/out-test-aligned-$tag-rejected" 2>/dev/null || true
  cp -p "$ACC/avg_r5_prev.msgpack" "$ACC/avg_last_3.msgpack"
  cp -p "$ACC/metrics_r5_prev.json" "$ACC/metrics.json"
  python scripts/merge_metrics.py "$ACC"
  return 2
}

PROBE=$(ls -v "$ACC/ckpts/p3probe"/ckpt_*.msgpack 2>/dev/null | tail -1)
[ -n "$PROBE" ] || { note "no p3probe checkpoint — aborting"; exit 1; }

train_phase p3pe "$PROBE" 3000 3e-4 || exit 1
if ce_gate p3pe; then
  note "CE gate passed (p3pe) — staged publish"
  publish_stage p3pe || note "stage p3pe not adopted"
else
  note "CE gate FAILED (p3pe) — continuing to polish phase anyway"
fi

P3PE=$(ls -v "$ACC/ckpts/p3pe"/ckpt_*.msgpack | tail -1)
train_phase p3pe-sa "$P3PE" 4000 1e-4 --shiftaug || exit 1
if ce_gate p3pe-sa; then
  note "CE gate passed (p3pe-sa)"
  publish_stage p3pe-sa || note "stage p3pe-sa not adopted"
else
  note "CE gate FAILED (p3pe-sa, vs incumbent valsplit_acc1x.json, margin=$GATE_SEG_MARGIN slack=$GATE_AL_SLACK) — not adopting"
  exit 2
fi
note "r5 chain done"

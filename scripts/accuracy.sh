#!/usr/bin/env bash
# Self-contained accuracy loop: synthetic-speech corpus -> train -> unaligned
# decode -> WER/WDER, all through the real CLIs (the reference chain
# tal/asr/train.py -> tal/asr/test.py --unaligned -> aligned_to_wder_format
# -> wder_search; BASELINE.md parity surface).
#
# The corpus audio ENCODES the text (tal_asrd_tpu/data/synth.py), so the
# trained model generalizes to held-out episodes and the resulting corpus
# WER/WDER is a real regression number, not a memorization check.
#
# Round-3 settings: corpus v2 (8 speakers on a 15 Hz hum grid with
# per-utterance jitter -> aligned WDER is a live nonzero signal, not 0.0), and
# training windows matched to the decode window (--max-secs 28.5 ~ the
# unaligned chunk of 357 encoder frames) — round 2 trained on <=10 s segments
# and the 28.5 s unaligned decode ran out-of-distribution (93% WER).
#
# Scale knobs (defaults give a multi-hour run on one TPU v5e chip):
#   ACC_DIR=accuracy ACC_EPISODES=100 ACC_STEPS=4000 ACC_BATCH=16
#   ACC_TEST_EPISODES=4 ACC_SPEAKERS=8 ACC_MAXSECS=28.5
#   ACC_WARM=path.msgpack   (warm start; speaker-token embeddings expanded)
set -euo pipefail

DIR=${ACC_DIR:-accuracy}
EPISODES=${ACC_EPISODES:-100}
STEPS=${ACC_STEPS:-4000}
BATCH=${ACC_BATCH:-16}
TEST_EPISODES=${ACC_TEST_EPISODES:-4}
SPEAKERS=${ACC_SPEAKERS:-8}
MAXSECS=${ACC_MAXSECS:-28.5}
NAME=${ACC_NAME:-acc1x}
LR=${ACC_LR:-4e-4}
LOAD=${ACC_LOAD:-}   # optional warm-start params checkpoint (strict partial)
WARM=${ACC_WARM:-}   # optional warm start w/ speaker-embedding expansion
CKPT_EVERY=${ACC_CKPT_EVERY:-5}   # epoch-ckpt I/O dominates small-corpus epochs
# Extra flags for the decode test legs (e.g. --enc-posenc: architecture flags
# must match how the checkpoint was trained; cli.test shares the parser).
TEST_FLAGS=${ACC_TEST_FLAGS:-}
# Unaligned-leg-only decode flags, defaulting to the measured winner: VAD
# speech bounds -> decode windows (the reference's transcribe.py:113-121
# pre-gated path). Swept on the real chip 2026-08-19: sliding state machine
# WER 92.7/WDER 59.1 vs VAD-windowed 56.9/17.8 on the same checkpoint.
UNALIGNED_FLAGS=${ACC_UNALIGNED_FLAGS:---vad-windows}
EP_SECS=${ACC_EPISODE_SECS:-120}  # train/valid episode length
TEST_SECS=${ACC_TEST_SECS:-180}   # test episode length (must exceed the
                                  # 28.5 s unaligned window)

mkdir -p "$DIR"

# Corpus v2 marker: regenerate when the synth renderer changes materially.
if [ ! -f "$DIR/train/transcript.pkl" ] || [ ! -f "$DIR/train/.corpus_v2" ]; then
  rm -rf "$DIR/train" "$DIR/valid" "$DIR/test"
  python -m tal_asrd_tpu.cli.tools synth-corpus --out-dir "$DIR/train" \
      --episodes "$EPISODES" --episode-seconds "$EP_SECS" --speakers "$SPEAKERS" --seed 0
  python -m tal_asrd_tpu.cli.tools synth-corpus --out-dir "$DIR/valid" \
      --episodes 3 --episode-seconds "$EP_SECS" --speakers "$SPEAKERS" --seed 101
  python -m tal_asrd_tpu.cli.tools synth-corpus --out-dir "$DIR/test" \
      --episodes "$TEST_EPISODES" --episode-seconds "$TEST_SECS" --speakers "$SPEAKERS" --seed 202
  touch "$DIR/train/.corpus_v2"
fi

if [ ! -f "$DIR/bpe.model" ]; then
  python - "$DIR" <<'PY'
import sys
from tal_asrd_tpu.data.synth import corpus_text
d = sys.argv[1]
open(f"{d}/train_text.txt", "w").write("\n".join(corpus_text(f"{d}/train")))
PY
  python -m tal_asrd_tpu.cli.tools train-tokenizer --input "$DIR/train_text.txt" \
      --model-prefix "$DIR/bpe" --vocab-size 300
fi

# --no-specaug: SpecAugment's freq/time masks delete the ONLY discriminative
# bins of the zero-redundancy synthetic tone cipher (a 1 s time mask erases
# ~8 characters whose tokens remain as targets) -> an irreducible loss floor
# (~3.8 measured). Natural-speech corpora should keep it on.
#
# TWO-PHASE CURRICULUM (measured, round 3): training directly on 28.5 s
# multi-utterance windows plateaus at val ~3.92 ~= the corpus unigram entropy
# — the decoder learns the LM prior but cross-attention never locks onto the
# audio (2.7k steps, no click). Short single utterances first (phase 1,
# <=10 s) let alignment click, then phase 2 warm-starts on 28.5 s
# --shiftaug windows matched to the unaligned decode chunk (357 enc frames)
# so the full-episode state machine runs in-distribution — the same
# short-then-long continuation that worked in round 2.
# Phase-1 epochs are ~10 s (short utterances, small graphs): run long and
# let early stopping cut it — 3000 steps stopped mid-descent (val 3.65).
STEPS1=${ACC_STEPS1:-14000}
LR2=${ACC_LR2:-2e-4}

# Restored-from-release mode (VERDICT r4 #2 follow-through): after a reboot
# wipes the gitignored tree, persist_ckpt.py --restore repopulates
# avg_last_3.msgpack but NOT the per-phase ckpts/ dirs. Re-earning ~30k
# training steps to evaluate an already-earned checkpoint is exactly the
# waste the release artifact exists to prevent — skip straight to the eval
# legs. Any ckpt dir present means live training state exists and the
# normal resume logic applies.
if [ -f "$DIR/avg_last_3.msgpack" ] \
   && [ -z "$(ls "$DIR/ckpts/$NAME"/ckpt_*.msgpack 2>/dev/null)" ] \
   && [ -z "$(ls "$DIR/ckpts/${NAME}-p1"/ckpt_*.msgpack 2>/dev/null)" ]; then
  echo "[accuracy] restored avg_last_3.msgpack with no ckpt tree — skipping training"
  ACC_SKIP_TRAIN=1
else
  ACC_SKIP_TRAIN=${ACC_SKIP_TRAIN:-}
fi

if [ -z "$ACC_SKIP_TRAIN" ] \
   && [ -z "$(ls "$DIR/ckpts/${NAME}-p1"/ckpt_*.msgpack 2>/dev/null)" ]; then
  python -m tal_asrd_tpu.cli.train \
      --train-data "$DIR/train" --valid-data "$DIR/valid" \
      --tokenizer "$DIR/bpe.model" --model-type 1x \
      --num-speakers "$SPEAKERS" --batch-size "$BATCH" --max-secs 10 \
      --num-workers 0 --lr "$LR" --max-epochs 1000 --max-steps "$STEPS1" \
      --ckpt-every "$CKPT_EVERY" ${LOAD:+--load "$LOAD"} \
      ${WARM:+--load-decoder "$WARM" --no-strict} \
      --no-specaug --cache-items --audio-int16 \
      --name "${NAME}-p1" --checkpoint-path "$DIR/ckpts" \
      --out-dir "$DIR/out-train"
fi

# Phase 1b: linear decay kills the LR by the end of phase 1 while val is
# still falling ~0.12/1.2k steps — a fresh LR cycle on the same short task
# keeps the descent going (1.47 -> ~1.1 measured) before the long windows.
STEPS1B=${ACC_STEPS1B:-12000}
LR1B=${ACC_LR1B:-2e-4}
if [ -z "$ACC_SKIP_TRAIN" ] && [ "$STEPS1B" -gt 0 ] \
   && [ -z "$(ls "$DIR/ckpts/${NAME}-p1b"/ckpt_*.msgpack 2>/dev/null)" ]; then
  P1=$(ls -v "$DIR/ckpts/${NAME}-p1"/ckpt_*.msgpack | tail -1)
  python -m tal_asrd_tpu.cli.train \
      --train-data "$DIR/train" --valid-data "$DIR/valid" \
      --tokenizer "$DIR/bpe.model" --model-type 1x \
      --num-speakers "$SPEAKERS" --batch-size "$BATCH" --max-secs 10 \
      --num-workers 0 --lr "$LR1B" --max-epochs 1000 --max-steps "$STEPS1B" \
      --ckpt-every "$CKPT_EVERY" --load "$P1" \
      --no-specaug --cache-items --audio-int16 \
      --name "${NAME}-p1b" --checkpoint-path "$DIR/ckpts" \
      --out-dir "$DIR/out-train"
fi

if [ -z "$ACC_SKIP_TRAIN" ] \
   && [ -z "$(ls "$DIR/ckpts/$NAME"/ckpt_*.msgpack 2>/dev/null)" ]; then
  PREV=$(ls -v "$DIR/ckpts/${NAME}-p1b"/ckpt_*.msgpack 2>/dev/null | tail -1)
  [ -z "$PREV" ] && PREV=$(ls -v "$DIR/ckpts/${NAME}-p1"/ckpt_*.msgpack | tail -1)
  python -m tal_asrd_tpu.cli.train \
      --train-data "$DIR/train" --valid-data "$DIR/valid" \
      --tokenizer "$DIR/bpe.model" --model-type 1x \
      --num-speakers "$SPEAKERS" --batch-size "$BATCH" --max-secs "$MAXSECS" \
      --num-workers 0 --lr "$LR2" --max-epochs 1000 --max-steps "$STEPS" \
      --ckpt-every "$CKPT_EVERY" --load "$PREV" \
      --no-specaug --shiftaug --cache-items --audio-int16 \
      --name "$NAME" --checkpoint-path "$DIR/ckpts" --out-dir "$DIR/out-train"
fi

# Average the last 3 epoch checkpoints (the reference's avg_last_5.pt flow,
# tal/utils/average_weights.py:13-29 / transcribe.py:217). Skip when the
# existing average is newer than every source checkpoint — rewriting it would
# reset the freshness clock the eval legs below key their skip logic off.
NEWEST_CKPT=$(ls -t "$DIR/ckpts/$NAME"/ckpt_*.msgpack 2>/dev/null | head -1 || true)
if [ -n "$NEWEST_CKPT" ] && { [ ! -f "$DIR/avg_last_3.msgpack" ] \
   || [ "$NEWEST_CKPT" -nt "$DIR/avg_last_3.msgpack" ]; }; then
  python -m tal_asrd_tpu.cli.tools average-ckpt \
      --ckpt-dir "$DIR/ckpts/$NAME" --last-k 3 --out "$DIR/avg_last_3.msgpack"
fi

# Aligned eval (the reference's headline WER surface: per-utterance decode,
# system.py:625-762) AND unaligned eval (the long-form product path:
# full-episode state machine). Both go through the same wder-format + wder
# CLIs; metrics.json carries both.
#
# The decode legs are skip-if-fresh (test_result newer than the evaluated
# checkpoint): a crash-and-relaunch cycle later in the chain must not pay
# for hours of re-decoding legs that already completed for this checkpoint.
fresh() { [ -f "$1" ] && [ "$1" -nt "$DIR/avg_last_3.msgpack" ]; }

if ! fresh "$DIR/out-test-aligned/test_result.pkl"; then
  python -m tal_asrd_tpu.cli.test \
      --train-data "$DIR/train" --valid-data "$DIR/valid" --test-data "$DIR/test" \
      --tokenizer "$DIR/bpe.model" --model-type 1x --num-speakers "$SPEAKERS" \
      --num-workers 0 --load "$DIR/avg_last_3.msgpack" $TEST_FLAGS \
      --out-dir "$DIR/out-test-aligned"
fi

python -m tal_asrd_tpu.cli.tools wder-format \
    --test-result "$DIR/out-test-aligned/test_result.pkl" \
    --out "$DIR/wder_ready_aligned.pkl"

WDER_FLAGS=${ACC_WDER_FLAGS:-}   # e.g. --allow-degenerate (CPU smokes only)
python -m tal_asrd_tpu.cli.wder --eval-file "$DIR/wder_ready_aligned.pkl" \
    --workers 1 $WDER_FLAGS

if ! fresh "$DIR/out-test/test_result.pkl"; then
  python -m tal_asrd_tpu.cli.test \
      --train-data "$DIR/train" --valid-data "$DIR/valid" --test-data "$DIR/test" \
      --tokenizer "$DIR/bpe.model" --model-type 1x --num-speakers "$SPEAKERS" \
      --num-workers 0 --unaligned --load "$DIR/avg_last_3.msgpack" \
      $TEST_FLAGS $UNALIGNED_FLAGS \
      --out-dir "$DIR/out-test"
fi

python -m tal_asrd_tpu.cli.tools wder-format \
    --test-result "$DIR/out-test/test_result.pkl" --out "$DIR/wder_ready.pkl"

python -m tal_asrd_tpu.cli.wder --eval-file "$DIR/wder_ready.pkl" --workers 1 \
    $WDER_FLAGS

# Summarize the dumped metrics pickles into metrics.json; bench.py folds
# these into its JSON line (standing WER/WDER regression, VERDICT r1 #1).
# Both pickles must exist AND be newer than the evaluated checkpoint, so a
# partial rerun can never mix metrics from different checkpoints.
TEST_FLAGS="$TEST_FLAGS" UNALIGNED_FLAGS="$UNALIGNED_FLAGS" python - "$DIR" <<'PY'
import glob, json, os, pickle, subprocess, sys, time
d = sys.argv[1]
ckpt = f"{d}/avg_last_3.msgpack"
paths = {"aligned": f"{d}/wder_ready_aligned-wder.pkl",
         "unaligned": f"{d}/wder_ready-wder.pkl"}
for leg, p in paths.items():
    if not os.path.exists(p):
        sys.exit(f"accuracy summary: missing {leg} metrics pickle {p}")
    if os.path.getmtime(p) < os.path.getmtime(ckpt):
        sys.exit(f"accuracy summary: {p} is OLDER than {ckpt} — stale eval; "
                 f"rerun the {leg} test leg")
al = pickle.load(open(paths["aligned"], "rb"))
un = pickle.load(open(paths["unaligned"], "rb"))
try:
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True).stdout.strip()
except Exception:
    commit = ""
# Provenance (VERDICT r3 #5): every published number names the corpus
# version, the exact checkpoint (+mtime), and when it was measured, so a
# reader can tell a live number from a stale one and merge_metrics.py can
# evict bases whose corpus/checkpoint no longer exist.
markers = sorted(glob.glob(f"{d}/train/.corpus_v*"))
corpus = os.path.basename(markers[-1])[len(".corpus_"):] if markers else "unknown"
iso = lambda t: time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime(t))
json.dump(
    {"wer_pct": round(100 * al["overall_wer"], 3),
     "wder_pct": round(100 * al["overall_wder"], 3),
     "unaligned_wer_pct": round(100 * un["overall_wer"], 3),
     "unaligned_wder_pct": round(100 * un["overall_wder"], 3),
     "segments": len(un["dist"]),
     "commit": commit,
     "corpus": corpus,
     "checkpoint": os.path.basename(ckpt),
     "checkpoint_mtime": iso(os.path.getmtime(ckpt)),
     "test_flags": os.environ.get("TEST_FLAGS", ""),
     "unaligned_flags": os.environ.get("UNALIGNED_FLAGS", ""),
     "measured_at": iso(time.time())},
    open(f"{d}/metrics.json", "w"))
print(f"accuracy metrics -> {d}/metrics.json")
PY
# Fold standing sidecar metrics (UIS-RNN DER, VAD F1, embed-chain WDER) back
# in and publish the tracked copy at the repo root (accuracy/ is gitignored).
python "$(dirname "$0")/merge_metrics.py" "$DIR"

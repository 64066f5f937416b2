#!/usr/bin/env bash
# Idempotent, lock-guarded corpus-v2 + BPE bootstrap (factored out of
# accuracy.sh so the r4 chain can self-bootstrap after the 2026-08-18 reboot
# wiped accuracy/ — the gitignored corpus, checkpoints, and chain ledger all
# vanished while the repo survived).
#
# Safe to call concurrently (a pre-warming session + the chain): a mkdir lock
# elects one generator; everyone else waits for the ready marker. Runs on CPU
# (JAX pinned) so it never touches the TPU tunnel while perf capture owns it.
#
# Corpus layout parity: the reference's TAL dataset dirs (episode wavs +
# transcript.pkl index, /root/reference/tal/asr/data/aligned.py:51-108).
set -uo pipefail
cd "$(dirname "$0")/.."

DIR=${ACC_DIR:-accuracy}
EPISODES=${ACC_EPISODES:-100}
TEST_EPISODES=${ACC_TEST_EPISODES:-4}
SPEAKERS=${ACC_SPEAKERS:-8}
EP_SECS=${ACC_EPISODE_SECS:-120}
TEST_SECS=${ACC_TEST_SECS:-180}
LOCK="$DIR/.corpus_gen.lock"
READY="$DIR/.corpus_ready"

mkdir -p "$DIR"

corpus_ok() {
  [ -f "$DIR/train/transcript.pkl" ] && [ -f "$DIR/train/.corpus_v2" ] \
    && [ -f "$DIR/bpe.model" ] && [ -f "$READY" ]
}

corpus_ok && exit 0

if ! mkdir "$LOCK" 2>/dev/null; then
  echo "[ensure_corpus] another generator holds $LOCK; waiting"
  for _ in $(seq 1 240); do   # up to 2 h; synth is CPU-bound but minutes-scale
    corpus_ok && exit 0
    # stale-lock break: generator died without removing the lock
    if [ ! -d "$LOCK" ]; then corpus_ok && exit 0 || break; fi
    sleep 30
  done
  if ! mkdir "$LOCK" 2>/dev/null; then
    echo "[ensure_corpus] gave up waiting for the lock" >&2
    exit 1
  fi
fi
trap 'rmdir "$LOCK" 2>/dev/null' EXIT

# Never compete with chip workloads: synthesis + BPE are numpy/CPU work.
export JAX_PLATFORMS=cpu

if [ ! -f "$DIR/train/transcript.pkl" ] || [ ! -f "$DIR/train/.corpus_v2" ]; then
  rm -rf "$DIR/train" "$DIR/valid" "$DIR/test"
  python -m tal_asrd_tpu.cli.tools synth-corpus --out-dir "$DIR/train" \
      --episodes "$EPISODES" --episode-seconds "$EP_SECS" \
      --speakers "$SPEAKERS" --seed 0 || exit 1
  python -m tal_asrd_tpu.cli.tools synth-corpus --out-dir "$DIR/valid" \
      --episodes 3 --episode-seconds "$EP_SECS" \
      --speakers "$SPEAKERS" --seed 101 || exit 1
  python -m tal_asrd_tpu.cli.tools synth-corpus --out-dir "$DIR/test" \
      --episodes "$TEST_EPISODES" --episode-seconds "$TEST_SECS" \
      --speakers "$SPEAKERS" --seed 202 || exit 1
  touch "$DIR/train/.corpus_v2"
fi

if [ ! -f "$DIR/bpe.model" ]; then
  python - "$DIR" <<'PY' || exit 1
import sys
from tal_asrd_tpu.data.synth import corpus_text
d = sys.argv[1]
open(f"{d}/train_text.txt", "w").write("\n".join(corpus_text(f"{d}/train")))
PY
  python -m tal_asrd_tpu.cli.tools train-tokenizer \
      --input "$DIR/train_text.txt" \
      --model-prefix "$DIR/bpe" --vocab-size 300 || exit 1
fi

touch "$READY"
echo "[ensure_corpus] corpus v2 + bpe ready under $DIR/"

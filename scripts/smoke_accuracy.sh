#!/usr/bin/env bash
# CPU smoke of the FULL accuracy chain (corpus -> 3 train phases -> avg ->
# aligned + unaligned eval -> wder -> metrics merge) through the real CLIs.
#
# Exists to catch CLI/flag/shell breakage BEFORE burning TPU time: the real
# 1x model is ~98 s/step on this 1-core host, so the smoke shrinks the
# architecture via TAL_TINY_ARCH (see cli/args.py) and the corpus via the
# ACC_* knobs. Numbers produced here are meaningless; only exit status and
# artifact schemas matter.
#
# Runtime target: <15 min on the idle 1-core box.
set -euo pipefail
cd "$(dirname "$0")/.."

export TAL_JAX_PLATFORMS=cpu
export TAL_TINY_ARCH=1

DIR=${SMOKE_DIR:-/tmp/accsmoke_tiny}
rm -rf "$DIR"

# --allow-degenerate: a few-step model emits no complete utterances, which
# the wder CLI (correctly) refuses to score in production; the smoke scores
# it worst-case instead so the summary/merge plumbing is exercised too.
ACC_DIR="$DIR" ACC_EPISODES=2 ACC_TEST_EPISODES=1 ACC_SPEAKERS=8 \
ACC_EPISODE_SECS=60 ACC_TEST_SECS=40 \
ACC_STEPS1=6 ACC_STEPS1B=4 ACC_STEPS=4 ACC_BATCH=4 ACC_CKPT_EVERY=1 \
ACC_NAME=smoke ACC_WDER_FLAGS=--allow-degenerate \
  bash scripts/accuracy.sh

# The speaker-embedding WDER chain (gen_embed -> metric head -> clustering
# WDER) reuses the aligned test results; smoke it on the same tiny model.
# embed_chain expects the accuracy.sh default checkpoint name ('acc1x' dir
# layout is irrelevant — it only reads $DIR/avg_last_3.msgpack).
ACC_DIR="$DIR" ACC_SPEAKERS=8 EMBED_STEPS=20 \
ACC_WDER_FLAGS=--allow-degenerate bash scripts/embed_chain.sh

python - "$DIR" <<'PY'
import json, sys
m = json.load(open(f"{sys.argv[1]}/metrics.json"))
for k in ("wer_pct", "wder_pct", "unaligned_wer_pct", "unaligned_wder_pct"):
    assert k in m, f"metrics.json missing {k}"
print("smoke chain OK:", m)
PY

#!/usr/bin/env bash
# Post-training eval chain: wait for a training PID to exit, then run the
# (idempotent, training-skipping) accuracy eval legs, the speaker-embedding
# WDER chain, and the sidecar-metric merge. Keeps the chip busy the moment
# training frees it.
#
#   scripts/post_train_chain.sh <train_pid>
set -uo pipefail
PID=${1:-}
if [ -n "$PID" ]; then
  echo "[post_train_chain] waiting on pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 30; done
  echo "[post_train_chain] pid $PID exited; starting eval chain"
fi
cd "$(dirname "$0")/.."
bash scripts/accuracy.sh && bash scripts/embed_chain.sh \
  && python scripts/merge_metrics.py accuracy
echo "[post_train_chain] done rc=$?"

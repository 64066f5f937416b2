#!/usr/bin/env bash
# Speaker-embedding WDER chain end-to-end (the reference's second diarization
# mode): trained speaker-token model -> expected speaker embeddings
# (gen_embed.py:22-124) -> contrastive metric head (train_embed.py) ->
# clustering WDER over the aligned test results (wder_search_emb.py:320-445).
#
# Requires a finished scripts/accuracy.sh run in $DIR (avg_last_3.msgpack +
# wder_ready_aligned.pkl with speakerEmbed entries). Appends the clustering
# WDERs to $DIR/embed_metrics.json.
set -euo pipefail

DIR=${ACC_DIR:-accuracy}
SPEAKERS=${ACC_SPEAKERS:-8}
STEPS=${EMBED_STEPS:-2000}

# Staleness guard: every skip-if-exists artifact below derives from
# avg_last_3.msgpack — anything older than the checkpoint belongs to a
# previous training run and must be rebuilt, never reused (same provenance
# rule as accuracy.sh's summary guard).
for f in "$DIR/spk.train.pkl" "$DIR/spk.valid.pkl" "$DIR/embed_head.msgpack"; do
  if [ -f "$f" ] && [ "$f" -ot "$DIR/avg_last_3.msgpack" ]; then
    echo "embed_chain: $f is older than avg_last_3.msgpack — rebuilding" >&2
    rm -f "$f"
  fi
done

# 1. Export expected speaker embeddings over the train split (teacher-forced).
if [ ! -f "$DIR/spk.train.pkl" ]; then
  python -m tal_asrd_tpu.cli.gen_embed \
      --train-data "$DIR/train" --valid-data "$DIR/valid" \
      --tokenizer "$DIR/bpe.model" --model-type 1x --num-speakers "$SPEAKERS" \
      --num-workers 0 --load "$DIR/avg_last_3.msgpack" ${ACC_TEST_FLAGS:-} \
      --out-path "$DIR/spk"
fi

# 2. Train the contrastive metric head on the exported embeddings.
if [ ! -f "$DIR/embed_head.msgpack" ]; then
  python -m tal_asrd_tpu.cli.train_embed \
      --train-data "$DIR/spk.train.pkl" --valid-data "$DIR/spk.valid.pkl" \
      --steps "$STEPS" --out "$DIR/embed_head.msgpack"
fi

# 3. Clustering WDER over the aligned test results: raw 64-d expected
#    embeddings and metric-head 10-d embeddings, agglomerative/cos_dist
#    (the reference grid's usual winner; full grid via cli.wder_search).
WDER_FLAGS=${ACC_WDER_FLAGS:-}   # e.g. --allow-degenerate (CPU smokes only)
python -m tal_asrd_tpu.cli.wder --eval-file "$DIR/wder_ready_aligned.pkl" \
    --workers 1 --cluster --cluster-method agglomerative --metric cos_dist \
    $WDER_FLAGS
mv "$DIR/wder_ready_aligned-wder.pkl" "$DIR/wder_cluster_raw.pkl"

python -m tal_asrd_tpu.cli.wder --eval-file "$DIR/wder_ready_aligned.pkl" \
    --workers 1 --cluster --cluster-method agglomerative --metric cos_dist \
    --embed-head "$DIR/embed_head.msgpack" $WDER_FLAGS
mv "$DIR/wder_ready_aligned-wder.pkl" "$DIR/wder_cluster_head.pkl"

python - "$DIR" <<'PY'
import json, pickle, sys
d = sys.argv[1]
raw = pickle.load(open(f"{d}/wder_cluster_raw.pkl", "rb"))
head = pickle.load(open(f"{d}/wder_cluster_head.pkl", "rb"))
out = {"cluster_wder_pct": round(100 * raw["overall_wder"], 3),
       "cluster_head_wder_pct": round(100 * head["overall_wder"], 3)}
json.dump(out, open(f"{d}/embed_metrics.json", "w"))
print("embed-chain metrics:", out)
# fold into the root metrics for bench.py pickup
try:
    m = json.load(open(f"{d}/metrics.json"))
    m.update(out)
    json.dump(m, open(f"{d}/metrics.json", "w"))
    import shutil, os
    shutil.copy(f"{d}/metrics.json",
                os.path.join(os.path.dirname(d) or ".", "ACCURACY.json"))
except FileNotFoundError:
    pass
PY

#!/usr/bin/env bash
# UIS-RNN diarization baseline DER on the synthetic corpus (the reference's
# separate-diarization baseline: wav2vec-style per-utterance features ->
# UIS-RNN k-fold experiment, tal/diarization/uisrnn/train.py:16-303 +
# evals.py:31-64). Produces a standing uisrnn_der_pct in $DIR/metrics.json.
#
# Runs on CPU (set TAL_JAX_PLATFORMS=cpu) so it can proceed while the chip
# trains. Knobs: DER_ITERS (fit iterations), DER_EPISODES (cap), DER_K.
set -euo pipefail

DIR=${ACC_DIR:-accuracy}
ITERS=${DER_ITERS:-2500}
K=${DER_K:-5}
BEAM=${DER_BEAM:-6}
LOOKAHEAD=${DER_LOOKAHEAD:-1}

if [ ! -d "$DIR/diarfeat" ] || [ -z "$(ls "$DIR/diarfeat" 2>/dev/null)" ]; then
  TAL_JAX_PLATFORMS=cpu python -m tal_asrd_tpu.cli.tools diar-features \
      --data "$DIR/train" --out-dir "$DIR/diarfeat" --features logmel
fi

TAL_JAX_PLATFORMS=cpu python -m tal_asrd_tpu.cli.uisrnn \
    --features "$DIR/diarfeat/*.pkl" --mode kfold \
    --observation-dim 160 --rnn-hidden-size 256 \
    --train-iteration "$ITERS" --k-folds "$K" \
    --beam-size "$BEAM" --look-ahead "$LOOKAHEAD" --test-iteration 2 \
    | tee "$DIR/uisrnn_out.txt"

python - "$DIR" <<'PY'
import json, re, sys
d = sys.argv[1]
txt = open(f"{d}/uisrnn_out.txt").read()
m = re.search(r"mean accuracy: ([0-9.]+) \(DER ([0-9.]+)\)", txt)
assert m, "no accuracy line in uisrnn output"
der = round(100 * float(m.group(2)), 3)
out = {"uisrnn_der_pct": der}
json.dump(out, open(f"{d}/uisrnn_metrics.json", "w"))
print("uisrnn DER:", der, "%")
try:
    meta = json.load(open(f"{d}/metrics.json"))
    meta.update(out)
    json.dump(meta, open(f"{d}/metrics.json", "w"))
    import os, shutil
    shutil.copy(f"{d}/metrics.json",
                os.path.join(os.path.dirname(d) or ".", "ACCURACY.json"))
except FileNotFoundError:
    pass
PY

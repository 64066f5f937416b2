#!/usr/bin/env bash
# CPU-scale pre-validation of the r4 multi-utterance bridge hypothesis,
# runnable entirely without the (currently dead) axon tunnel.
#
# Two arms from a shared short-task base, on the debug-tiny architecture
# (TAL_TINY_ARCH, ~385k params) over the REAL corpus v2:
#
#   control: p1 -> direct 28.5 s shiftaug                (the r3 recipe that
#                                                         fell into the
#                                                         LM-prior basin)
#   bridge:  p1 -> p2m exact-aligned 4-utterance windows
#               -> 28.5 s shiftaug + multi-utterance mix  (the r4 chain)
#
# Evidence: per-distribution teacher-forced CE (scripts/val_split.py) of each
# arm's final checkpoint. The bridge hypothesis predicts the bridge arm sits
# measurably below the control on SEGMENT windows (the unaligned decode's
# distribution) without cannibalizing aligned CE. Numbers land in
# accuracy/tiny_bridge_probe.json.
#
# Runs nice -19 so a recovering TPU chain always outranks it for the single
# CPU core. Idempotent: finished phases short-circuit on .done markers.
set -uo pipefail
cd "$(dirname "$0")/.."

export TAL_JAX_PLATFORMS=cpu
export TAL_TINY_ARCH=1

CK=accuracy/ckpts-tiny
OUT=accuracy/out-train-tiny
mkdir -p "$CK" "$OUT"

run() {  # name load secs steps lr extra...
  local name=$1 load=$2 secs=$3 steps=$4 lr=$5; shift 5
  [ -f "$CK/$name/.done" ] && return 0
  local cur="$load" latest
  latest=$(ls -t "$CK/$name"/ckpt_*.msgpack 2>/dev/null | head -1 || true)
  [ -n "$latest" ] && cur="$latest"
  nice -n 19 python -m tal_asrd_tpu.cli.train \
    --train-data accuracy/train --valid-data accuracy/valid \
    --tokenizer accuracy/bpe.model --model-type 1x --num-speakers 8 \
    --batch-size 8 --max-secs "$secs" --num-workers 0 --lr "$lr" \
    --max-epochs 1000 --max-steps "$steps" --ckpt-every 2 \
    ${cur:+--load "$cur"} --no-specaug --cache-items --audio-int16 \
    --name "$name" --checkpoint-path "$CK" --out-dir "$OUT" "$@" \
    && touch "$CK/$name/.done"
}

run tb-p1 "" 10 1200 3e-4 || exit 1
P1=$(ls -t "$CK"/tb-p1/ckpt_*.msgpack | head -1)

# control arm: the r3 recipe (direct long shiftaug windows)
run tb-ctl "$P1" 28.5 700 1e-4 --shiftaug || exit 1

# bridge arm: the r4 chain (exact-aligned multi-utterance, then shiftaug mix)
run tb-p2m "$P1" 28.5 700 1e-4 --num-utterances 4 || exit 1
P2M=$(ls -t "$CK"/tb-p2m/ckpt_*.msgpack | head -1)
run tb-bridge "$P2M" 28.5 700 1e-4 --shiftaug --num-utterances 4 || exit 1

CTL=$(ls -t "$CK"/tb-ctl/ckpt_*.msgpack | head -1)
BRG=$(ls -t "$CK"/tb-bridge/ckpt_*.msgpack | head -1)
P1CK=$(ls -t "$CK"/tb-p1/ckpt_*.msgpack | head -1)

for pair in "p1_base:$P1CK" "control:$CTL" "bridge:$BRG"; do
  arm=${pair%%:*}; ckpt=${pair#*:}
  nice -n 19 python scripts/val_split.py "$ckpt" --max-secs 28.5 \
    --batches 6 > "$OUT/valsplit_$arm.json" || exit 1
done

python - "$OUT" <<'PY'
import json, subprocess, sys
out_dir = sys.argv[1]
res = {"probe": "tiny-arch bridge-vs-control (CPU, corpus v2)",
       "arch": "TAL_TINY_ARCH (~385k params) — trajectories, not absolutes"}
for arm in ("p1_base", "control", "bridge"):
    with open(f"{out_dir}/valsplit_{arm}.json") as f:
        v = json.load(f)
    res[arm] = {"val_aligned": v["val_aligned"],
                "val_segment": v["val_segment"], "ckpt": v["ckpt"]}
res["segment_ce_delta_bridge_vs_control"] = round(
    res["control"]["val_segment"] - res["bridge"]["val_segment"], 4)
res["commit"] = subprocess.run(
    ["git", "rev-parse", "--short", "HEAD"],
    capture_output=True, text=True).stdout.strip()
with open("accuracy/tiny_bridge_probe.json", "w") as f:
    json.dump(res, f, indent=1)
print(json.dumps(res, indent=1))
PY

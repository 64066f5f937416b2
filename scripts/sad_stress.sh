#!/usr/bin/env bash
# De-saturated SAD eval (VERDICT r3 #8): neural PyanNet SAD vs the energy-VAD
# gate on the SAD STRESS corpus (noise floor, 0-20 dB SNR sweep, crossfaded
# bounds, hum-only + broadband distractors). The plain synth corpus saturates
# both detectors at F1 ~97-99.9; this corpus gives both headroom so the
# ordering (and any regression) is visible.
#
# Publishes accuracy/sad_stress_metrics.json:
#   sad_stress_{precision,recall,f1}_pct  — trained PyanNet
#   vad_stress_{precision,recall,f1}_pct  — energy gate (webrtc-style trigger)
#
# CPU-runnable (PyanNet is small); ~15-25 min on the 1-core box.
set -euo pipefail
cd "$(dirname "$0")/.."

export TAL_JAX_PLATFORMS=${TAL_JAX_PLATFORMS:-cpu}

DIR=${SAD_STRESS_DIR:-accuracy/sad_stress}
STEPS=${SAD_STRESS_STEPS:-500}
EPISODES=${SAD_STRESS_EPISODES:-6}
EP_SECS=${SAD_STRESS_EP_SECS:-90}

if [ ! -f "$DIR/train/transcript.pkl" ]; then
  python -m tal_asrd_tpu.cli.tools synth-sad-stress --out-dir "$DIR/train" \
      --episodes "$EPISODES" --episode-seconds "$EP_SECS" --seed 0
  python -m tal_asrd_tpu.cli.tools synth-sad-stress --out-dir "$DIR/test" \
      --episodes 3 --episode-seconds "$EP_SECS" --seed 99
fi

python -m tal_asrd_tpu.cli.sad --train-data "$DIR/train" \
    --test-data "$DIR/test" --out-dir "$DIR/sad" --steps "$STEPS" \
    --json-out "$DIR/sad_neural.json"

python -m tal_asrd_tpu.cli.vad --data-dir "$DIR/test" --out-dir "$DIR/vad" \
    --eval-transcripts --no-speech-wav --workers 1 \
    --prop-start 0.5 --prop-end 0.9 --json-out "$DIR/vad_energy.json"

python - "$DIR" <<'PY'
import json, sys
d = sys.argv[1]
sad = json.load(open(f"{d}/sad_neural.json"))
vad = json.load(open(f"{d}/vad_energy.json"))
out = {f"sad_stress_{k.split('_',1)[1]}": v for k, v in sad.items()}
out.update({
    "vad_stress_precision_pct": vad.get("vad_precision_pct"),
    "vad_stress_recall_pct": vad.get("vad_recall_pct"),
    "vad_stress_f1_pct": vad.get("vad_f1_pct"),
})
json.dump(out, open("accuracy/sad_stress_metrics.json", "w"))
print("sad_stress metrics:", json.dumps(out))
PY
python scripts/merge_metrics.py accuracy

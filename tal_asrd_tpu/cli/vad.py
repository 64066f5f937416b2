"""VAD CLI: batch speech detection + evaluation.

Usage parity with `python -m wildspeech.vad.webrtcvad` (/root/reference/tal/
vad/webrtcvad.py:215-259) and vad_tal_test.py / eval.py: run VAD over a
directory, write bounds pickles + speech-only wavs, optionally score against
gold transcript bounds.
"""
from __future__ import annotations

import argparse
import os
import pickle


def main(argv=None):
    p = argparse.ArgumentParser("VAD pipeline")
    p.add_argument("--data-dir", type=str, required=True)
    p.add_argument("--out-dir", type=str, required=True)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--vad-level", type=int, default=3)
    # Trigger/detrigger ring-buffer proportions (the reference exposes these
    # on vad_collector, speech_detect.py:100; tone-like audio with periodic
    # sub-frame dips needs a start proportion below the speech default 0.9).
    p.add_argument("--prop-start", type=float, default=0.9)
    p.add_argument("--prop-end", type=float, default=0.9)
    p.add_argument("--detector", choices=["energy", "gmm"], default="energy")
    p.add_argument("--no-speech-wav", action="store_true", default=False)
    p.add_argument("--eval-transcripts", action="store_true", default=False,
                   help="score against transcript.pkl utterance bounds")
    p.add_argument("--json-out", type=str, default=None,
                   help="write mean P/R/F1/compression as JSON")
    args = p.parse_args(argv)

    from tal_asrd_tpu.vad import VadConfig, evaluate_vad, run_vad_directory

    cfg = VadConfig(vad_level=args.vad_level,
                    prop_voice_start=args.prop_start,
                    prop_unvoice_end=args.prop_end,
                    detector=args.detector)
    bounds_map = run_vad_directory(
        args.data_dir, args.out_dir, cfg, workers=args.workers,
        write_speech_wav=not args.no_speech_wav,
    )
    print(f"Processed {len(bounds_map)} files")

    if args.eval_transcripts:
        from tal_asrd_tpu.data import get_duration, load_transcripts
        from tal_asrd_tpu.vad.eval import utterance_gold_bounds

        transcripts = load_transcripts(args.data_dir)
        scores = []
        for path, bounds in bounds_map.items():
            stub = os.path.splitext(os.path.basename(path))[0]
            if stub not in transcripts:
                continue
            dur = get_duration(path)
            gold = utterance_gold_bounds(transcripts[stub])
            s = evaluate_vad(bounds, gold, dur)
            scores.append(s)
            print(f"{stub}: P {s.precision:.3f} R {s.recall:.3f} "
                  f"F1 {s.f1:.3f} compression {s.compression:.3f}")
        if args.json_out and scores:
            import json
            mean = lambda k: sum(getattr(s, k) for s in scores) / len(scores)
            with open(args.json_out, "w") as f:
                json.dump({"vad_precision_pct": round(100 * mean("precision"), 2),
                           "vad_recall_pct": round(100 * mean("recall"), 2),
                           "vad_f1_pct": round(100 * mean("f1"), 2),
                           "vad_compression_pct": round(100 * mean("compression"), 2)},
                          f)
            print(f"VAD metrics -> {args.json_out}")


if __name__ == "__main__":
    main()

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
    p.add_argument("--no-speech-wav", action="store_true", default=False)
    p.add_argument("--eval-transcripts", action="store_true", default=False,
                   help="score against transcript.pkl utterance bounds")
    args = p.parse_args(argv)

    from tal_asrd_tpu.vad import VadConfig, evaluate_vad, run_vad_directory

    cfg = VadConfig(vad_level=args.vad_level)
    bounds_map = run_vad_directory(
        args.data_dir, args.out_dir, cfg, workers=args.workers,
        write_speech_wav=not args.no_speech_wav,
    )
    print(f"Processed {len(bounds_map)} files")

    if args.eval_transcripts:
        from tal_asrd_tpu.data import get_duration, load_transcripts
        from tal_asrd_tpu.vad.eval import utterance_gold_bounds

        transcripts = load_transcripts(args.data_dir)
        for path, bounds in bounds_map.items():
            stub = os.path.splitext(os.path.basename(path))[0]
            if stub not in transcripts:
                continue
            dur = get_duration(path)
            gold = utterance_gold_bounds(transcripts[stub])
            s = evaluate_vad(bounds, gold, dur)
            print(f"{stub}: P {s.precision:.3f} R {s.recall:.3f} "
                  f"F1 {s.f1:.3f} compression {s.compression:.3f}")


if __name__ == "__main__":
    main()

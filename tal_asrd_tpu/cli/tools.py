"""Corpus / checkpoint tooling CLI.

Covers the reference's data_scratch + utils scripts as subcommands:
  * train-tokenizer  — BPE training (tal-cased.py / SentencePieceTrainer)
  * convert-audio    — any container -> mono 16 kHz wav (convert_wav.py,
                       utils/audio.py)
  * chunk-audio      — split wavs into fixed chunks (chunk_audio.py)
  * average-ckpt     — last-k checkpoint averaging (utils/average_weights.py)
  * expand-speakers  — embedding-row expansion (utils/expand_speakers.py)
  * merge-outputs    — jsonl shards -> pickle (utils/merge_outputs.py)
  * force-align      — attention forced aligner (alignment/aeneas.py)
"""
from __future__ import annotations

import argparse
import os
from glob import glob


def main(argv=None):
    p = argparse.ArgumentParser("tal_asrd_tpu tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train-tokenizer")
    t.add_argument("--input", required=True, help="text corpus file")
    t.add_argument("--model-prefix", required=True)
    t.add_argument("--vocab-size", type=int, default=10000)
    t.add_argument("--character-coverage", type=float, default=1.0)

    c = sub.add_parser("convert-audio")
    c.add_argument("--src", required=True)
    c.add_argument("--out-dir", required=True)
    c.add_argument("--sr", type=int, default=16000)

    ch = sub.add_parser("chunk-audio")
    ch.add_argument("--src", required=True)
    ch.add_argument("--out-dir", required=True)
    ch.add_argument("--chunk-secs", type=float, default=30.0)

    a = sub.add_parser("average-ckpt")
    a.add_argument("--ckpt-dir", required=True)
    a.add_argument("--last-k", type=int, default=5)
    a.add_argument("--out", required=True)

    e = sub.add_parser("expand-speakers")
    e.add_argument("--ckpt", required=True)
    e.add_argument("--num-tokens", type=int, required=True)
    e.add_argument("--out", required=True)

    m = sub.add_parser("merge-outputs")
    m.add_argument("--inputs", nargs="+", required=True)
    m.add_argument("--out", required=True)

    args = p.parse_args(argv)

    if args.cmd == "train-tokenizer":
        from tal_asrd_tpu.text import BpeTrainer

        model = BpeTrainer(args.vocab_size, args.character_coverage).train_file(
            args.input, args.model_prefix + ".model"
        )
        print(f"trained {len(model)}-piece model -> {args.model_prefix}.model")

    elif args.cmd == "convert-audio":
        from tal_asrd_tpu.data.audio_io import convert_audio

        files = glob(args.src) if any(ch in args.src for ch in "*?") else [args.src]
        os.makedirs(args.out_dir, exist_ok=True)
        for f in files:
            stub = os.path.splitext(os.path.basename(f))[0]
            convert_audio(f, os.path.join(args.out_dir, stub + ".wav"), args.sr)
        print(f"converted {len(files)} files")

    elif args.cmd == "chunk-audio":
        from tal_asrd_tpu.data.audio_io import get_duration, load_audio_segment, write_wav

        files = glob(args.src) if any(ch in args.src for ch in "*?") else [args.src]
        os.makedirs(args.out_dir, exist_ok=True)
        for f in files:
            stub = os.path.splitext(os.path.basename(f))[0]
            dur = get_duration(f)
            i = 0
            t = 0.0
            while t < dur:
                seg = load_audio_segment(f, t, min(t + args.chunk_secs, dur))
                write_wav(os.path.join(args.out_dir, f"{stub}_{i:04d}.wav"), seg)
                t += args.chunk_secs
                i += 1
        print("done")

    elif args.cmd == "average-ckpt":
        from tal_asrd_tpu.core.checkpoint import CheckpointManager, save_pytree

        mgr = CheckpointManager(args.ckpt_dir)
        avg = mgr.average_last(args.last_k)
        save_pytree(args.out, avg)
        print(f"averaged last {args.last_k} of {len(mgr.steps())} -> {args.out}")

    elif args.cmd == "expand-speakers":
        import numpy as np

        from tal_asrd_tpu.core.checkpoint import (
            expand_speaker_embeddings,
            load_pytree,
            save_pytree,
        )

        params = load_pytree(args.ckpt)
        emb = np.asarray(params["embedding"]["embedding"])
        params["embedding"]["embedding"] = expand_speaker_embeddings(
            emb, args.num_tokens
        )
        save_pytree(args.out, params)
        print(f"expanded embedding {emb.shape[0]} -> {args.num_tokens} rows")

    elif args.cmd == "merge-outputs":
        from tal_asrd_tpu.eval.tools import merge_outputs

        rows = merge_outputs(args.inputs, args.out)
        print(f"merged {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()

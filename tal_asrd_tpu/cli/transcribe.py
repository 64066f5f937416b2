"""Standalone windowed transcription CLI.

Usage parity with `python -m wildspeech.asr.transcribe` (/root/reference/tal/
asr/transcribe.py:311-459): transcribe a directory (or single file) of wavs
with overlapped windows + splicing, optional VAD gating, skip-if-output-
exists resume (:401-403).
"""
from __future__ import annotations

import argparse
import os
from glob import glob

from tal_asrd_tpu.core.checkpoint import load_params_partial, load_pytree
from tal_asrd_tpu.core.config import ModelConfig
from tal_asrd_tpu.decode.transcribe import TranscribeConfig, Transcriber
from tal_asrd_tpu.models import ASRModel
from tal_asrd_tpu.text import BpeTokenizer


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--audio", type=str, required=True,
                   help="wav file or directory of wavs")
    p.add_argument("--out-dir", type=str, default="out/transcripts")
    p.add_argument("--load", type=str, required=True)
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--model-type", type=str, default="2x")
    p.add_argument("--num-speakers", type=int, default=0)
    p.add_argument("--window-secs", type=float, default=30.0)
    p.add_argument("--overlap", type=float, default=0.25)
    p.add_argument("--batch-size", type=int, default=15)
    p.add_argument("--beam-size", type=int, default=4)
    p.add_argument("--lm-weight", type=float, default=0.0)
    p.add_argument("--length", type=int, default=120)
    p.add_argument("--truncate", type=float, default=-1.0)
    p.add_argument("--speech-only", action="store_true", default=False)
    p.add_argument("--no-splice", action="store_true", default=False)
    p.add_argument("--use-eos", action="store_true", default=False,
                   help="terminate on EOS instead of EOT")
    p.add_argument("--bf16-params", action="store_true", default=False,
                   help="cast loaded params to bf16 once before decoding "
                        "(halves per-step weight HBM reads)")
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = get_parser().parse_args(argv)
    tokenizer = BpeTokenizer(model_path=args.tokenizer)
    cfg = ModelConfig(model_type=args.model_type,
                      num_speakers=args.num_speakers,
                      vocab_size=len(tokenizer))
    model = ASRModel(cfg, dtype=jnp.bfloat16)
    init_vars = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16000 * 3), jnp.float32),
        jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([16000 * 3]),
    )
    params = load_params_partial(init_vars["params"], load_pytree(args.load),
                                 strict=False)
    variables = {"params": params}
    if args.bf16_params:
        # Inference-width weights (see bench.py BENCH_BF16_PARAMS).
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)

    tc = TranscribeConfig(
        window_seconds=args.window_secs,
        overlap=args.overlap,
        batch_size=args.batch_size,
        beam_size=args.beam_size,
        lm_weight=args.lm_weight,
        max_new_tokens=args.length,
        use_eot=not args.use_eos,
        speech_only=args.speech_only,
        splice=not args.no_splice,
    )
    tr = Transcriber(model, variables, tokenizer, tc)

    files = (
        sorted(glob(os.path.join(args.audio, "*.wav")))
        if os.path.isdir(args.audio)
        else [args.audio]
    )
    os.makedirs(args.out_dir, exist_ok=True)
    for path in files:
        stub = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.out_dir, stub + ".txt")
        if os.path.exists(out_path):  # resume (transcribe.py:401-403)
            print(f"skip {stub} (exists)")
            continue
        result = tr.transcribe_file(path, truncate=args.truncate, log=True)
        text = result if isinstance(result, str) else "\n".join(result)
        with open(out_path, "w") as f:
            f.write(text + "\n")
        print(f"wrote {out_path}")


if __name__ == "__main__":
    main()

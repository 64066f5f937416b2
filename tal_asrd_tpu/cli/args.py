"""Shared CLI argument parsers, preserving the reference's flag surface
(/root/reference/tal/asr/args.py:4-107) so existing invocations port over:
--train-data/--valid-data/--test-data, --tokenizer, --model-type,
--batch-size, --beam-size, --num-speakers, --spk-weight, --lm-weight,
--smoothing, --shiftaug/--alignaug, --unaligned, --quick-test,
--overfit-pct, --load/--load-encoder/--load-decoder, --no-strict, etc.
"""
from __future__ import annotations

import argparse


def get_argparser(is_train: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--load", type=str, default=None)
    p.add_argument("--load-encoder", type=str, default=None)
    p.add_argument("--load-decoder", type=str, default=None)
    p.add_argument("--train-data", type=str, action="append", required=True)
    p.add_argument("--valid-data", type=str, action="append", required=True)
    p.add_argument("--test-data", type=str, action="append")
    p.add_argument("--cache-path", type=str, default="./cache")
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--model-type", type=str, required=True, choices=["1x", "2x"])
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--patience", type=int, default=10,
                   help="early-stop patience in validation rounds; LR-restart "
                        "phases need more headroom than the default (a fresh "
                        "LR cycle transiently worsens val before it helps — "
                        "the r4 p1b phase early-stopped at 1320/12000 steps)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--val-batch-size", type=int, default=None)
    p.add_argument("--beam-size", type=int, default=5)
    p.add_argument("--fused-decode", action="store_true", default=False,
                   help="per-token decode via the fused Pallas layer-step "
                        "kernel (speaker-token models)")
    p.add_argument("--bf16-params", action="store_true", default=False,
                   help="cast loaded params to bf16 once before decoding "
                        "(halves per-step weight HBM reads; eval numerics "
                        "shift by the bf16 rounding of the weights)")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--grad-acc", type=int, default=1)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-secs", type=float, default=20)
    p.add_argument("--no-strict", action="store_true", default=False)
    p.add_argument("--num-speakers", type=int, default=0)
    p.add_argument("--quick-test", action="store_true", default=False)
    p.add_argument("--unaligned", action="store_true", default=False)
    p.add_argument("--unaligned-lanes", type=int, default=8,
                   help="decode up to N equal-length episodes in lockstep "
                        "through the vmapped state machine (bit-identical "
                        "per lane; ~Nx less wall time); 1 = sequential")
    # Unaligned state-machine knobs (DecodeConfig defaults = the reference's
    # constants, asr/args.py:25). Sweepable via scripts/unaligned_sweep.py.
    p.add_argument("--thresh-prct", type=float, default=None)
    p.add_argument("--shift-prct", type=float, default=None)
    p.add_argument("--stall-patience", type=int, default=None)
    p.add_argument("--skip-prct", type=float, default=None)
    p.add_argument("--evict-block", type=int, default=None,
                   help="history-cap eviction block (1 = reference slide-by-1)")
    p.add_argument("--eos-advance", action="store_true", default=False,
                   help="EXTENSION: emitted EOS advances the window to the "
                        "attention centroid and re-primes history (see "
                        "decode/unaligned.py UnalignedSpec.eos_advance)")
    p.add_argument("--vad-windows", action="store_true", default=False,
                   help="long-form decode via VAD-gated windows (the "
                        "reference's transcribe.py:113-121 path) instead of "
                        "the sliding-window state machine")
    p.add_argument("--vad-max-window", type=float, default=20.0,
                   help="max VAD decode-window seconds before the quietest-"
                        "frame split (vad/windows.py)")
    p.add_argument("--stall-rollback", action="store_true", default=False,
                   help="EXTENSION: stall resets also roll back the "
                        "unanchored tokens emitted since last progress")
    p.add_argument("--shiftaug", action="store_true", default=False)
    p.add_argument("--alignaug", action="store_true", default=False)
    p.add_argument("--spk-weight", type=float, default=0)
    p.add_argument("--enc-posenc", action="store_true", default=False,
                   help="ReZero-gated sinusoidal positional code on the "
                        "decode-side memory (core/config.py enc_posenc). "
                        "Must match between train and eval legs; gate init 0 "
                        "keeps posenc-free checkpoints loadable+identical")
    p.add_argument("--val-check-interval", type=int, default=None)
    p.add_argument("--lm-weight", type=float, default=0)
    p.add_argument("--smoothing", type=float, default=0)
    p.add_argument("--lm-path", type=str, default=None)
    p.add_argument("--out-dir", type=str, default="out")
    p.add_argument("--mesh-data", type=int, default=-1,
                   help="data-parallel mesh axis size (-1: all devices)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis size")
    if is_train:
        p.add_argument("--no-specaug", action="store_true", default=False,
                       help="disable SpecAugment (narrowband/synthetic data)")
        p.add_argument("--audio-int16", action="store_true", default=False,
                       help="ship audio to the device as int16 (half the "
                            "transfer; lossless for 16-bit PCM sources)")
        p.add_argument("--ckpt-every", type=int, default=1,
                       help="checkpoint every N epochs (per-epoch = reference"
                            " Lightning behavior)")
        p.add_argument("--state-ckpt", choices=["last", "every"],
                       default="last",
                       help="write the full resume state (opt moments) only "
                            "on the final epoch ('last', 3x less device->host "
                            "traffic per ckpt) or on every ckpt epoch")
        p.add_argument("--cache-items", action="store_true", default=False,
                       help="cache decoded dataset items in RAM (small "
                            "corpora; removes the host IO bottleneck)")
        p.add_argument("--num-utterances", type=str, default="1",
                       help="consecutive utterances per aligned item (N>1 "
                            "teaches EOS-continuation with exact alignment — "
                            "the bridge phase to shiftaug windows). A comma "
                            "list ('1,4') concatenates one aligned dataset "
                            "per value — the anti-forgetting mix (short task "
                            "stays in-distribution while continuation trains)")
        p.add_argument("--no-restore-step", action="store_true", default=False,
                       help="do NOT restore the step counter when --load "
                            "points at this run's own checkpoint dir (same-"
                            "run warm starts keep ckpt numbering monotonic "
                            "by default)")
        p.add_argument("--name", type=str, required=True)
        p.add_argument("--project", type=str, default="asr")
        p.add_argument("--checkpoint-path", type=str, default="./models/tal-asrd-tpu")
        p.add_argument("--overfit-pct", type=float, default=0)
    return p


def get_lm_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--train-data", type=str, required=True)
    p.add_argument("--valid-data", type=str, required=True)
    p.add_argument("--epoch-len", type=int, default=5000)
    p.add_argument("--cache-path", type=str, default="./cache")
    p.add_argument("--tokenizer", type=str, required=True)
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--hidden-size", type=int, default=768)
    p.add_argument("--layers", type=int, default=4)
    p.add_argument("--attn-heads", type=int, default=4)
    p.add_argument("--max-len", type=int, default=512)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--name", type=str, required=True)
    p.add_argument("--checkpoint-path", type=str, default="./models/tal-asrd-tpu")
    p.add_argument("--load", type=str, default=None)
    p.add_argument("--quick-test", action="store_true", default=False)
    return p


def build_configs(args, tokenizer=None):
    """argparse Namespace -> framework config dataclasses.

    `tokenizer`, when given, sizes the text vocabulary (the reference derives
    num_tokens from len(tokenizer) + num_speakers, tal/asr/models.py:103-117;
    without it the ModelConfig default of 10000 — the TAL BPE size — is kept).
    """
    import os

    from tal_asrd_tpu.core.config import DecodeConfig, ModelConfig, TrainConfig

    tiny = {}
    if os.environ.get("TAL_TINY_ARCH"):
        # Debug-only shrink for CPU smokes of the full CLI chain (the real 1x
        # model is ~98 s/step on this 1-core host). Train AND eval legs must
        # both run with the env var set or checkpoint shapes mismatch loudly.
        tiny = dict(tds_depths=(1, 1, 1), width_mult=0.1, d_decoder_override=64)
        print("[args] TAL_TINY_ARCH set: depths (1,1,1), width_mult 0.1, "
              "d_decoder 64 — debug smoke architecture, NOT the 1x/2x model")
    model_cfg = ModelConfig(
        model_type=args.model_type,
        num_speakers=args.num_speakers,
        use_speaker_head=args.spk_weight > 0,
        enc_posenc=getattr(args, "enc_posenc", False),
        **({"vocab_size": len(tokenizer)} if tokenizer is not None else {}),
        **tiny,
    )
    train_cfg = TrainConfig(
        batch_size=args.batch_size,
        val_batch_size=args.val_batch_size,
        lr=args.lr,
        grad_acc=args.grad_acc,
        max_steps=args.max_steps,
        max_epochs=args.max_epochs,
        smoothing=args.smoothing,
        spk_weight=args.spk_weight,
        lm_weight=args.lm_weight,
        max_secs=args.max_secs,
    )
    dc_over = {
        k: v for k, v in (
            ("thresh_prct", getattr(args, "thresh_prct", None)),
            ("shift_prct", getattr(args, "shift_prct", None)),
            ("stall_patience", getattr(args, "stall_patience", None)),
            ("skip_prct", getattr(args, "skip_prct", None)),
            ("history_evict_block", getattr(args, "evict_block", None)),
        ) if v is not None
    }
    decode_cfg = DecodeConfig(beam_size=args.beam_size, lm_weight=args.lm_weight,
                              use_fused_decode=getattr(args, "fused_decode", False),
                              eos_advance=getattr(args, "eos_advance", False),
                              stall_rollback=getattr(args, "stall_rollback", False),
                              **dc_over)
    return model_cfg, train_cfg, decode_cfg

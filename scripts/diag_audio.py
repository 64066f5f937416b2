"""Diagnostic: is the decoder actually using the audio?

Evaluates a checkpoint's validation loss twice on the same batches:
  (a) as-is, and (b) with the audio rolled by one along the batch axis
(so every sample gets the WRONG audio). If (a) ~= (b), the model is acting
as a pure LM and the acoustic pathway is not contributing; if (a) << (b),
the decoder conditions on the encoder output.

    python scripts/diag_audio.py --ckpt accuracy/ckpts/acc1x/ckpt_*.msgpack \
        --data accuracy/valid --tokenizer accuracy/bpe.model [--cpu]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--tokenizer", required=True)
    ap.add_argument("--model-type", default="1x")
    ap.add_argument("--num-speakers", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--batches", type=int, default=2)
    ap.add_argument("--max-secs", type=float, default=10.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=1")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from tal_asrd_tpu.core.checkpoint import load_pytree, load_params_partial
    from tal_asrd_tpu.core.config import (ModelConfig, SpecAugmentConfig,
                                          TrainConfig)
    from tal_asrd_tpu.data.aligned import AlignedDataset
    from tal_asrd_tpu.data.collate import BucketedCollater
    from tal_asrd_tpu.data.loader import DataLoader, ShardedSampler
    from tal_asrd_tpu.text.bpe import BpeTokenizer
    from tal_asrd_tpu.train.system import ASRSystem

    tok = BpeTokenizer(model_path=args.tokenizer)
    cfg = ModelConfig(model_type=args.model_type,
                      num_speakers=args.num_speakers,
                      vocab_size=len(tok))
    system = ASRSystem(
        cfg, TrainConfig(batch_size=args.batch_size, lr=1e-4),
        specaug_cfg=SpecAugmentConfig(num_freq_masks=0, num_time_masks=0))

    ds = AlignedDataset(
        args.data, tok, num_utterances=1, max_segment_duration=args.max_secs,
        speaker_map_loc=os.path.join(args.data, "speaker_map.json"),
        return_spk_ids=True)
    loader = DataLoader(ds, args.batch_size, BucketedCollater(tok.pad_token_id),
                        ShardedSampler(len(ds), shuffle=False), 0)

    it = iter(loader)
    batch0 = next(it)
    state = system.init_state(jax.random.PRNGKey(0), batch0)
    state = state.replace(params=load_params_partial(
        state.params, load_pytree(args.ckpt), strict=True))
    eval_step = system.make_eval_step()

    for bi in range(args.batches):
        batch = batch0 if bi == 0 else next(it)
        real = eval_step(state, batch)
        wrong = eval_step(state, {
            **batch,
            "audio": jnp.roll(batch["audio"], 1, axis=0),
            "audio_lens": jnp.roll(batch["audio_lens"], 1, axis=0),
        })
        print(f"batch {bi}: loss(real audio) = {float(real['loss']):.4f}   "
              f"loss(wrong audio) = {float(wrong['loss']):.4f}")


if __name__ == "__main__":
    main()

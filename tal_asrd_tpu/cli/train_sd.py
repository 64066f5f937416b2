"""Separate-diarization baseline training CLI.

Usage parity with `python -m wildspeech.baseline.train` (/root/reference/tal/
baseline/train.py:16-83): trains SDModel on single-utterance speaker-ID
samples with the same LAMB/scheduler pattern as the ASR system.
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-data", type=str, action="append", required=True)
    p.add_argument("--valid-data", type=str, action="append", required=True)
    p.add_argument("--num-speakers", type=int, default=6008)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-epochs", type=int, default=100)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--max-secs", type=float, default=20)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--name", type=str, required=True)
    p.add_argument("--checkpoint-path", type=str, default="./models/tal-asrd-tpu")
    p.add_argument("--quick-test", action="store_true", default=False)
    args = p.parse_args(argv)

    import jax

    from tal_asrd_tpu.baseline import SDSystem
    from tal_asrd_tpu.core.checkpoint import CheckpointManager
    from tal_asrd_tpu.core.config import SDModelConfig, TrainConfig
    from tal_asrd_tpu.data import DataLoader, SDCollater, SDUtteranceDataset, ShardedSampler

    cfg = SDModelConfig(num_speakers=args.num_speakers)
    tc = TrainConfig(batch_size=args.batch_size, lr=args.lr,
                     max_steps=args.max_steps)
    system = SDSystem(cfg, tc)

    ds = SDUtteranceDataset(
        args.train_data[0],
        speaker_map_loc=os.path.join(args.train_data[0], "speaker_map.json"),
        max_segment_duration=args.max_secs,
    )
    loader = DataLoader(ds, args.batch_size, SDCollater(),
                        ShardedSampler(len(ds), shuffle=True),
                        args.num_workers)
    rng = jax.random.PRNGKey(0)
    state = system.init_state(rng, next(iter(loader)))
    step = system.make_train_step()
    mgr = CheckpointManager(os.path.join(args.checkpoint_path, args.name))

    n = 0
    for epoch in range(1 if args.quick_test else args.max_epochs):
        loader.sampler.set_epoch(epoch)
        for batch in loader:
            rng, r = jax.random.split(rng)
            state, metrics = step(state, batch, r)
            n += 1
            if n % 50 == 0 or args.quick_test:
                print(f"step {n}: loss {float(metrics['loss']):.4f} "
                      f"acc {float(metrics['spk_acc']):.4f}")
            if args.quick_test or (args.max_steps and n >= args.max_steps):
                break
        mgr.save(n, jax.device_get(state.params), extra={"epoch": epoch})
        if args.quick_test or (args.max_steps and n >= args.max_steps):
            break


if __name__ == "__main__":
    main()

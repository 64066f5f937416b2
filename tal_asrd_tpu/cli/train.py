"""ASR training CLI.

Usage parity with `python -m wildspeech.asr.train` (/root/reference/tal/asr/
train.py:16-108): builds aligned (+ optional segment-augmentation) datasets,
applies surgical partial loads (--load / --load-encoder / --load-decoder with
speaker-token embedding expansion), and runs the mesh-sharded trainer with
per-epoch checkpoints, early stopping (patience 10) and a per-validation
generation spot check.

    python -m tal_asrd_tpu.cli.train --train-data DIR --valid-data DIR \
        --tokenizer bpe.model --model-type 2x --name run1 [--num-speakers N]
"""
from __future__ import annotations

import os
import re

import jax
import jax.numpy as jnp
import numpy as np

from tal_asrd_tpu.cli.args import build_configs, get_argparser
from tal_asrd_tpu.core.checkpoint import (
    filter_subtree,
    load_params_partial,
    load_pytree,
    merge_subtree,
)
from tal_asrd_tpu.core.utils import count_parameters, set_seed
from tal_asrd_tpu.data import (
    AlignedDataset,
    BucketedCollater,
    DataLoader,
    SegmentDataset,
    ShardedSampler,
)
from tal_asrd_tpu.parallel.mesh import make_mesh
from tal_asrd_tpu.text import BpeTokenizer
from tal_asrd_tpu.train import ASRSystem
from tal_asrd_tpu.train.loop import Trainer, TrainerConfig
from tal_asrd_tpu.utils.logging import MetricsLogger


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self.offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self.offsets[-1])

    def __getitem__(self, i):
        di = int(np.searchsorted(self.offsets, i, side="right")) - 1
        return self.datasets[di][i - int(self.offsets[di])]


def build_datasets(args, tokenizer):
    tokenizer_speakers = args.num_speakers > 0 and args.spk_weight == 0
    # Comma list -> one aligned dataset per utterance count (the
    # anti-forgetting mix: '1,4' keeps the short task in-distribution while
    # the 4-utterance windows teach EOS-continuation).
    n_utts = [int(v) for v in str(getattr(args, "num_utterances", 1)).split(",")]
    train_parts = []
    for p in args.train_data:
        for n_utt in n_utts:
            train_parts.append(AlignedDataset(
                p, tokenizer, num_utterances=n_utt,
                max_segment_duration=args.max_secs,
                speaker_map_loc=os.path.join(p, "speaker_map.json"),
                tokenizer_speakers=tokenizer_speakers, return_spk_ids=True,
                cache_items=getattr(args, "cache_items", False),
            ))
        if args.shiftaug or args.alignaug:
            train_parts.append(SegmentDataset(
                p, tokenizer, segment_size=args.max_secs,
                speaker_map_loc=os.path.join(p, "speaker_map.json"),
                tokenizer_speakers=tokenizer_speakers,
                aligned_truncation=args.alignaug,
                return_spk_ids=not args.alignaug,
            ))
    valid_parts = [
        AlignedDataset(
            p, tokenizer, num_utterances=n_utt,
            max_segment_duration=args.max_secs,
            speaker_map_loc=os.path.join(p, "speaker_map.json"),
            tokenizer_speakers=tokenizer_speakers, return_spk_ids=True,
            cache_items=getattr(args, "cache_items", False),
        )
        for p in args.valid_data
        for n_utt in n_utts
    ]
    if args.shiftaug or args.alignaug:
        # Validate on the TARGET distribution too: without this, val_loss only
        # tracks single utterances and is blind to whether multi-utterance
        # windows (the unaligned decode's distribution) are being learned —
        # round-3 phase-2 plateaus were invisible until decode time.
        # det_seed fixes each window across epochs so val_loss is comparable.
        valid_parts += [
            SegmentDataset(
                p, tokenizer, segment_size=args.max_secs,
                speaker_map_loc=os.path.join(p, "speaker_map.json"),
                tokenizer_speakers=tokenizer_speakers,
                aligned_truncation=args.alignaug,
                return_spk_ids=not args.alignaug,
                det_seed=1234,
            )
            for p in args.valid_data
        ]
    return ConcatDataset(train_parts), ConcatDataset(valid_parts)


def maybe_restore_step(args, state):
    """Warm-start continuity: when --load points at one of THIS run's own
    epoch checkpoints (the crash-retry path of the training chains), restore
    the trainer step counter from the filename. Without this, a params-only
    load resets step to 0, so retries write RENUMBERED low-step checkpoints:
    "latest by step" then warm-starts from stale pre-crash weights, last-k
    averaging mixes training generations, and max-steps accounting re-pays
    already-trained steps (ADVICE r3, medium). Cross-run loads (curriculum
    phase hand-offs, surgical warm starts) keep step 0: their step budget is
    phase-relative by design."""
    if not args.load or getattr(args, "no_restore_step", False):
        return state
    m = re.match(r"ckpt_(\d+)\.msgpack$", os.path.basename(args.load))
    own_dir = os.path.abspath(os.path.join(args.checkpoint_path, args.name))
    if m and os.path.dirname(os.path.abspath(args.load)) == own_dir:
        step = int(m.group(1))
        state = state.replace(step=jnp.asarray(step, jnp.int32))
        print(f"[train] restored step counter to {step} (same-run warm start)")
    return state


def main(argv=None):
    args = get_argparser(is_train=True).parse_args(argv)
    rng = set_seed(42)

    tokenizer = BpeTokenizer(model_path=os.path.join(
        args.cache_path, "tokenizer", args.tokenizer
    ) if not os.path.exists(args.tokenizer) else args.tokenizer)

    model_cfg, train_cfg, _ = build_configs(args, tokenizer)
    mesh = make_mesh(args.mesh_data, args.mesh_model)
    train_cfg = type(train_cfg)(**{
        **train_cfg.__dict__, "num_data_shards": mesh.shape["data"],
    })
    from tal_asrd_tpu.core.config import SpecAugmentConfig

    specaug = (SpecAugmentConfig(num_freq_masks=0, num_time_masks=0)
               if getattr(args, "no_specaug", False) else SpecAugmentConfig())
    system = ASRSystem(model_cfg, train_cfg, specaug_cfg=specaug)

    train_ds, valid_ds = build_datasets(args, tokenizer)
    coll = BucketedCollater(tokenizer.pad_token_id,
                            audio_int16=getattr(args, "audio_int16", False))
    train_loader = DataLoader(
        train_ds, args.batch_size, coll,
        ShardedSampler(len(train_ds), shuffle=True), args.num_workers,
    )
    val_loader = DataLoader(
        valid_ds, args.val_batch_size or args.batch_size, coll,
        ShardedSampler(len(valid_ds), shuffle=False), args.num_workers,
    )

    batch0 = next(iter(val_loader))
    state = system.init_state(rng, batch0)
    print(f"Trainable params: {count_parameters(state.params):,}")

    # Surgical loads (train.py:37-84 parity)
    if args.load:
        state = state.replace(params=load_params_partial(
            state.params, load_pytree(args.load), strict=not args.no_strict
        ))
    if args.load_encoder:
        donor = load_pytree(args.load_encoder)
        enc = donor["encoder"] if "encoder" in donor else filter_subtree(donor, "encoder")
        state = state.replace(params=merge_subtree(state.params, "encoder", enc))
    if args.load_decoder:
        donor = load_pytree(args.load_decoder)
        state = state.replace(params=load_params_partial(
            state.params, donor, strict=False,
            expand_embeddings_to=model_cfg.num_tokens,
        ))

    state = maybe_restore_step(args, state)

    state = system.shard_state(mesh, state)

    logger = MetricsLogger(out_dir=args.out_dir, name=args.name,
                           project=args.project, config=vars(args))
    trainer = Trainer(
        system,
        TrainerConfig(
            max_epochs=args.max_epochs,
            max_steps=args.max_steps,
            early_stop_patience=getattr(args, "patience", 10),
            quick_test=args.quick_test,
            overfit_pct=args.overfit_pct,
            val_check_interval=args.val_check_interval,
            ckpt_every=getattr(args, "ckpt_every", 1),
            state_ckpt=getattr(args, "state_ckpt", "last"),
            checkpoint_dir=os.path.join(args.checkpoint_path, args.name),
        ),
        mesh=mesh,
        logger=logger,
        generation_hook=system.make_generation_spotcheck(tokenizer, batch0),
    )
    trainer.fit(state, train_loader, val_loader, rng)


if __name__ == "__main__":
    main()

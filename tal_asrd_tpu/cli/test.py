"""ASR evaluation CLI (aligned + unaligned).

Usage parity with `python -m wildspeech.asr.test` (/root/reference/tal/asr/
test.py:13-81): loads a checkpoint (+ optional shallow-fusion LM), clears the
output files, runs teacher-forced loss + generation over the test split, and
writes out/test_result.pkl, hyp.txt, ref.txt.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from tal_asrd_tpu.cli.args import build_configs, get_argparser
from tal_asrd_tpu.core.checkpoint import load_params_partial, load_pytree
from tal_asrd_tpu.core.config import DecodeConfig
from tal_asrd_tpu.data import AlignedDataset, BucketedCollater, DataLoader, ShardedSampler
from tal_asrd_tpu.data.audio_io import load_audio_segment
from tal_asrd_tpu.eval.runner import EvalRunner
from tal_asrd_tpu.models import ASRModel
from tal_asrd_tpu.text import BpeTokenizer
from tal_asrd_tpu.train import ASRSystem


def main(argv=None):
    args = get_argparser(is_train=False).parse_args(argv)
    assert args.test_data, "--test-data required"
    assert args.load, "--load (checkpoint) required"

    tokenizer = BpeTokenizer(model_path=args.tokenizer)
    model_cfg, train_cfg, decode_cfg = build_configs(args, tokenizer)
    decode_cfg = DecodeConfig(**{**decode_cfg.__dict__, "beam_size": args.beam_size})

    system = ASRSystem(model_cfg, train_cfg)
    tokenizer_speakers = args.num_speakers > 0 and args.spk_weight == 0

    data_dir = args.test_data[0]
    ds = AlignedDataset(
        data_dir, tokenizer,
        num_utterances=None if args.unaligned else 1,
        min_segment_duration=None if args.unaligned else 3,
        max_segment_duration=None if args.unaligned else args.max_secs,
        speaker_map_loc=os.path.join(data_dir, "speaker_map.json"),
        tokenizer_speakers=tokenizer_speakers,
        return_spk_ids=True,
    )
    coll = BucketedCollater(tokenizer.pad_token_id)
    rng = jax.random.PRNGKey(0)

    batch0 = coll([ds[0]]) if not args.unaligned else None
    if batch0 is None:
        wav, text, spk, _ = ds[0]
        batch0 = coll([(wav[: 16000 * 5], text[:32], spk[:32], 0)])
    state = system.init_state(rng, batch0)
    params = load_params_partial(
        state.params, load_pytree(args.load), strict=not args.no_strict
    )
    variables = {"params": params}
    if getattr(args, "bf16_params", False):
        # Inference-width weights (see bench.py BENCH_BF16_PARAMS): halves
        # the per-step weight HBM read of the decode loops. Off by default —
        # published accuracy numbers keep the f32 master weights.
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
            variables)

    # Optional shallow-fusion LM (test.py:47-55: DecoderLMModel vocab=10000,
    # hidden 512, 4 heads, 6 layers, max_len 512).
    lm = lm_variables = None
    if args.lm_path and args.lm_weight > 0:
        from tal_asrd_tpu.core.config import LMConfig
        from tal_asrd_tpu.models.lm import DecoderLMModel

        lm = DecoderLMModel(LMConfig(vocab_size=len(tokenizer)))
        lm_variables = {"params": load_pytree(args.lm_path)}

    runner = EvalRunner(system.model, variables, tokenizer, decode_cfg,
                        out_dir=args.out_dir, spk_weight=args.spk_weight,
                        lm=lm, lm_variables=lm_variables)

    if args.unaligned:
        # Group episodes by exact audio length and decode each group in
        # lockstep lanes (EvalRunner.test_step_unaligned_batched): per-lane
        # results are token-identical to the sequential loop, wall time is
        # the slowest lane per group. Only same-length episodes share a
        # group — padding would perturb the encoder boundary.
        lanes = max(1, args.unaligned_lanes)
        groups: dict = {}
        for i in range(len(ds)):
            stub, utts = ds.index[i]
            wav = load_audio_segment(
                os.path.join(data_dir, f"{stub}.wav"), 0.0, None
            )
            groups.setdefault(len(wav), []).append((wav, utts))
        for wav_len, items in groups.items():
            if args.vad_windows:
                # VAD-gated windowed decode (transcribe.py:113-121 path):
                # windows batch internally, episodes run sequentially
                for wav, utts in items:
                    info = runner.test_step_unaligned_vad(
                        wav, wav_len, utts,
                        max_window_s=args.vad_max_window)
                    print("vad-windows:", info)
                continue
            for j in range(0, len(items), lanes):
                part = items[j : j + lanes]
                if len(part) == 1 or lanes == 1:
                    for wav, utts in part:
                        runner.test_step_unaligned(wav, wav_len, utts)
                else:
                    runner.test_step_unaligned_batched(
                        [w for w, _ in part], wav_len,
                        [u for _, u in part])
    else:
        loader = DataLoader(
            ds, args.val_batch_size or args.batch_size, coll,
            ShardedSampler(len(ds), shuffle=False), args.num_workers,
            drop_last=False,
        )
        offset = 0
        for batch in loader:
            idxs = batch["idx"]
            refs = [ds.index[int(i)][1] for i in idxs]
            runner.test_step_aligned(batch, refs)
            offset += len(idxs)
    print(runner.test_end())


if __name__ == "__main__":
    main()

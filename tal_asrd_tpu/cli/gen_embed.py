"""Speaker-embedding export CLI (gen_embed.py:22-124 usage parity)."""
from __future__ import annotations

import os

from tal_asrd_tpu.cli.args import build_configs, get_argparser


def main(argv=None):
    p = get_argparser()
    p.add_argument("--out-path", type=str, required=True)
    args = p.parse_args(argv)
    assert args.load, "Specify path to weights."

    import jax

    from tal_asrd_tpu.core.checkpoint import load_params_partial, load_pytree
    from tal_asrd_tpu.data import AlignedDataset, BucketedCollater, DataLoader, ShardedSampler
    from tal_asrd_tpu.eval.gen_embed import generate_speaker_embeddings, save_split
    from tal_asrd_tpu.text import BpeTokenizer
    from tal_asrd_tpu.train import ASRSystem

    tokenizer = BpeTokenizer(model_path=args.tokenizer)
    model_cfg, train_cfg, _ = build_configs(args, tokenizer)
    system = ASRSystem(model_cfg, train_cfg)

    data_dir = args.train_data[0]
    ds = AlignedDataset(
        data_dir, tokenizer, num_utterances=1,
        max_segment_duration=args.max_secs,
        speaker_map_loc=os.path.join(data_dir, "speaker_map.json")
        if args.num_speakers > 0 else None,
        tokenizer_speakers=args.num_speakers > 0,
        return_spk_ids=True,
    )
    coll = BucketedCollater(tokenizer.pad_token_id)
    loader = DataLoader(ds, args.val_batch_size or args.batch_size, coll,
                        ShardedSampler(len(ds), shuffle=False),
                        args.num_workers, drop_last=False)

    state = system.init_state(jax.random.PRNGKey(0), coll([ds[0]]))
    params = load_params_partial(state.params, load_pytree(args.load),
                                 strict=not args.no_strict)
    embs, sids = generate_speaker_embeddings(
        system.model, {"params": params}, loader
    )
    print("Generated embeddings", embs.shape, sids.shape)
    save_split(embs, sids, args.out_path)
    print("Done.")


if __name__ == "__main__":
    main()

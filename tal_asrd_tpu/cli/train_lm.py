"""Shallow-fusion LM training CLI (the reference's trimmed LM trainer,
argparse surface from tal/asr/args.py:65-107)."""
from __future__ import annotations

import os
import pickle

from tal_asrd_tpu.cli.args import get_lm_argparser


def transcript_texts(data_dir: str):
    from tal_asrd_tpu.data import load_transcripts

    texts = []
    for utts in load_transcripts(data_dir).values():
        texts.extend(u["utterance"] for u in utts)
    return texts


def main(argv=None):
    args = get_lm_argparser().parse_args(argv)
    from tal_asrd_tpu.core.checkpoint import CheckpointManager
    from tal_asrd_tpu.core.config import LMConfig
    from tal_asrd_tpu.text import BpeTokenizer
    from tal_asrd_tpu.train.lm_system import LMSystem, LMTextDataset, batch_iterator

    tokenizer = BpeTokenizer(model_path=args.tokenizer)
    cfg = LMConfig(
        vocab_size=len(tokenizer),
        hidden_size=args.hidden_size,
        n_head=args.attn_heads,
        n_layers=args.layers,
        max_positions=args.max_len,
    )
    system = LMSystem(cfg, lr=args.lr, batch_size=args.batch_size)

    train_ds = LMTextDataset(transcript_texts(args.train_data), tokenizer,
                             args.max_len)
    valid_ds = LMTextDataset(transcript_texts(args.valid_data), tokenizer,
                             args.max_len)

    mgr = CheckpointManager(os.path.join(args.checkpoint_path, args.name))
    epochs = 1 if args.quick_test else args.max_epochs
    steps_per_epoch = 2 if args.quick_test else args.epoch_len
    step = 0
    for epoch in range(epochs):
        losses = system.fit(
            batch_iterator(train_ds, args.batch_size, seed=epoch),
            steps=steps_per_epoch,
        )
        step += len(losses)
        ppl = system.perplexity(batch_iterator(valid_ds, args.batch_size))
        print(f"epoch {epoch}: loss {losses[-1]:.4f} valid ppl {ppl:.2f}")
        mgr.save(step, system.state.params, extra={"ppl": ppl})
        if args.max_steps and step >= args.max_steps:
            break


if __name__ == "__main__":
    main()

"""Contrastive embedding-head training CLI (train_embed.py usage parity)."""
from __future__ import annotations

import argparse
import pickle


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-data", type=str, required=True,
                   help="spk.train.pkl from gen_embed")
    p.add_argument("--valid-data", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n-way", type=int, default=6)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out", type=str, default="out/embed_head.msgpack")
    args = p.parse_args(argv)

    import numpy as np

    from tal_asrd_tpu.core.checkpoint import save_pytree
    from tal_asrd_tpu.train.embed_system import (
        ContrastiveCollator,
        ContrastiveDataset,
        EmbedSystem,
    )

    with open(args.train_data, "rb") as f:
        emb, ids = pickle.load(f)
    with open(args.valid_data, "rb") as f:
        v_emb, v_ids = pickle.load(f)

    ds = ContrastiveDataset(emb, ids, n_way=args.n_way,
                            epoch_len=args.steps * args.batch_size)
    vds = ContrastiveDataset(v_emb, v_ids, n_way=args.n_way,
                             epoch_len=50 * args.batch_size, seed=1)
    coll = ContrastiveCollator()
    system = EmbedSystem(in_dim=emb.shape[1], lr=args.lr,
                         batch_size=args.batch_size)

    def batches(d, n):
        for i in range(n):
            yield coll([d[i * args.batch_size + j] for j in range(args.batch_size)])

    losses, accs = system.fit(batches(ds, args.steps))
    val_loss, val_acc = system.evaluate(batches(vds, 50))
    print(f"train acc {np.mean(accs[-50:]):.3f} valid acc {val_acc:.3f}")
    save_pytree(args.out, system.params)


if __name__ == "__main__":
    main()

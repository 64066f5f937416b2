"""WDER clustering grid-search CLI.

Usage parity with `python -m wildspeech.wder_search_emb --eval-file
wder_ready.pkl` (/root/reference/tal/wder_search.py:591-672 and the _emb
variants): grid-searches clustering engines/metrics/PCA dims over speaker
embeddings, reports per-param WDER with role attributions, saves a TSV.
"""
from __future__ import annotations

import argparse
import json
import pickle
import random

import numpy as np

from tal_asrd_tpu.eval.wder_search import (
    apply_embed_head,
    corpus_wder_map,
    default_param_grid,
    mean_utterance_embeddings,
    normalize_lower_no_punct,
)
from tal_asrd_tpu.utils.wordtok import tweet_tokenize, word_tokenize


def main(argv=None):
    p = argparse.ArgumentParser("WDER grid search")
    p.add_argument("--eval-file", type=str, required=True)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--tokenizer", choices=["punkt", "tweet"], default="punkt")
    p.add_argument("--mean", action="store_true", default=False,
                   help="average per-utterance token embeddings")
    p.add_argument("--lower-no-punct", action="store_true", default=False)
    p.add_argument("--embed-head", type=str, default=None,
                   help="trained contrastive metric-head params; maps "
                        "embeddings through the MLP before clustering")
    p.add_argument("--role-based", action="store_true", default=False)
    p.add_argument("--role-map", type=str, default=None)
    p.add_argument("--out-tsv", type=str, default="out/wder_search.tsv")
    args = p.parse_args(argv)

    np.random.seed(2020)
    random.seed(2020)

    with open(args.eval_file, "rb") as f:
        paired = pickle.load(f)

    if args.mean:
        paired = [(r, mean_utterance_embeddings(h)) for r, h in paired]
    if args.embed_head:
        paired = apply_embed_head(paired, args.embed_head)
    if args.lower_no_punct:
        paired = [
            ([(normalize_lower_no_punct(u), *rest) for u, *rest in r],
             [(normalize_lower_no_punct(u), *rest) for u, *rest in h])
            for r, h in paired
        ]
    role_map = None
    if args.role_map:
        with open(args.role_map) as f:
            role_map = {int(k): v for k, v in json.load(f).items()}

    tok_fn = word_tokenize if args.tokenizer == "punkt" else tweet_tokenize
    rows = corpus_wder_map(
        paired, default_param_grid(), tokenizer=tok_fn, workers=args.workers,
        role_based=args.role_based, role_map=role_map, verbose=True,
    )
    import os

    os.makedirs(os.path.dirname(args.out_tsv) or ".", exist_ok=True)
    with open(args.out_tsv, "w") as f:
        f.write("params\twder\tclusters\tref_spk\twer\thost\tinterviewer\tsubject\n")
        for pset, *vals in rows:
            f.write(str(pset) + "\t" + "\t".join(f"{v:.4f}" for v in vals) + "\n")
    print(f"wrote {args.out_tsv}")


if __name__ == "__main__":
    main()

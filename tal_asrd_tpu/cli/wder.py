"""WDER/WER evaluation CLI.

Usage parity with `python -m wildspeech.wder --eval-file results.pkl
--metric cos_dist [--cluster] [--wer-only]` (/root/reference/tal/wder.py:
357-464): consumes a pickle of (ref_utterances, hyp_utterances) pairs,
prints per-segment and corpus WDER/WER, dumps `<stub>-wder.pkl` metrics.
"""
from __future__ import annotations

import argparse
import os
import pickle
import random

import numpy as np

from tal_asrd_tpu.eval.clustering import make_cluster_fn
from tal_asrd_tpu.eval.wder import corpus_wder
from tal_asrd_tpu.utils.wordtok import tweet_tokenize, word_tokenize


def main(argv=None):
    p = argparse.ArgumentParser("WDER calculation")
    p.add_argument("--eval-file", type=str, required=True)
    p.add_argument("--wer-only", action="store_true", default=False)
    p.add_argument("--tokenizer", choices=["punkt", "tweet"], default="punkt")
    p.add_argument("--workers", type=int, default=16)
    p.add_argument("--cluster", action="store_true", default=False)
    p.add_argument("--metric",
                   choices=["euclidean", "cos_sim", "cos_dist", "idp", "ndp"],
                   default="euclidean")
    p.add_argument("--cluster-method", default="hdbscan",
                   choices=["hdbscan", "dbscan", "agglomerative", "gmm"])
    args = p.parse_args(argv)

    np.random.seed(2020)
    random.seed(2020)

    with open(args.eval_file, "rb") as f:
        paired_results = pickle.load(f)
    print(f"{len(paired_results):,} test pairs loaded from {args.eval_file}")

    tok_fn = word_tokenize if args.tokenizer == "punkt" else tweet_tokenize
    cluster_fn = (
        make_cluster_fn(args.cluster_method, metric=args.metric)
        if args.cluster else None
    )
    outputs = corpus_wder(
        paired_results, wer_only=args.wer_only, workers=args.workers,
        should_cluster=args.cluster, cluster_fn=cluster_fn,
        tokenizer=tok_fn, verbose=True,
    )
    stub = os.path.basename(args.eval_file).split(".", 1)[0]
    out = os.path.join(os.path.dirname(args.eval_file), f"{stub}-wder.pkl")
    with open(out, "wb") as f:
        pickle.dump(outputs, f)
    print(f"Dumped metrics to {out}")


if __name__ == "__main__":
    main()

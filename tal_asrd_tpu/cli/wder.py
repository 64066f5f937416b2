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
    p.add_argument("--embed-head", type=str, default=None,
                   help="trained contrastive metric-head params "
                        "(cli.train_embed output); maps utterance embeddings "
                        "through the MLP before clustering "
                        "(wder_search_emb.py metric-head mode)")
    p.add_argument("--grid-search", action="store_true", default=False,
                   help="hyper-search clustering params (wder.py:408-441 "
                        "gp_minimize analog: seeded random search, 10 calls)")
    p.add_argument("--n-calls", type=int, default=10)
    p.add_argument("--allow-degenerate", action="store_true", default=False,
                   help="score worst-case (WER/WDER 100%%) instead of "
                        "erroring when EVERY segment is skipped; for CPU "
                        "smokes of the chain on untrained models")
    args = p.parse_args(argv)

    np.random.seed(2020)
    random.seed(2020)

    with open(args.eval_file, "rb") as f:
        paired_results = pickle.load(f)
    print(f"{len(paired_results):,} test pairs loaded from {args.eval_file}")

    if args.embed_head:
        from tal_asrd_tpu.eval.wder_search import apply_embed_head

        paired_results = apply_embed_head(paired_results, args.embed_head)
        print(f"applied metric head {args.embed_head} to hyp embeddings")

    tok_fn = word_tokenize if args.tokenizer == "punkt" else tweet_tokenize

    if args.grid_search and args.cluster:
        # Hyper-search over min_cluster_size / min_samples (the reference
        # optimizes the same 2-int space with skopt gp_minimize, which is not
        # available offline; a seeded random search over the identical space
        # keeps the capability).
        rng = np.random.RandomState(0)
        best = (None, float("inf"), None)
        for call in range(args.n_calls):
            params = {
                "min_cluster_size": int(rng.randint(2, 11)),
                "min_samples": int(rng.randint(2, 11)),
            }
            fn = make_cluster_fn(args.cluster_method, metric=args.metric,
                                 **params)
            out = corpus_wder(
                paired_results, wer_only=args.wer_only, workers=args.workers,
                should_cluster=True, cluster_fn=fn, tokenizer=tok_fn,
            )
            wder = out[2]
            print(f"call {call}: {params} -> WDER {wder*100:.3f}%")
            if wder < best[1]:
                best = (params, wder, out)
        print(f"best: {best[0]} WDER {best[1]*100:.3f}%")
        outputs = best[2]
    else:
        cluster_fn = (
            make_cluster_fn(args.cluster_method, metric=args.metric)
            if args.cluster else None
        )
        outputs = corpus_wder(
            paired_results, wer_only=args.wer_only, workers=args.workers,
            should_cluster=args.cluster, cluster_fn=cluster_fn,
            tokenizer=tok_fn, verbose=True,
            allow_degenerate=args.allow_degenerate,
        )
    stub = os.path.basename(args.eval_file).split(".", 1)[0]
    out = os.path.join(os.path.dirname(args.eval_file), f"{stub}-wder.pkl")
    # Named fields (positional reads of the corpus_wder tuple were one silent
    # mis-index away from publishing wrong headline numbers).
    ref_spk, hyp_spk, overall_wder, dist, n_words, overall_wer = outputs
    with open(out, "wb") as f:
        pickle.dump({
            "ref_speakers": ref_spk,
            "hyp_speakers": hyp_spk,
            "overall_wder": overall_wder,
            "dist": dist,
            "n_words": n_words,
            "overall_wer": overall_wer,
        }, f)
    print(f"Dumped metrics to {out}")


if __name__ == "__main__":
    main()

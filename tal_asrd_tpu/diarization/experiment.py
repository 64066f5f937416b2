"""UIS-RNN experiment runners: k-fold CV and large-scale streaming training.

Parity targets:
  * tal/diarization/uisrnn/train.py:16-303 — k-fold cross-validation over
    per-episode feature files: train on k-1 folds, predict + score the rest,
    with --quick-test slicing;
  * tal/diarization/uisrnn/train_large.py:22-318 — streaming fit() over
    batches of files with a model checkpoint after every batch (crash-safe
    incremental training).

Feature files: pickles of (sequences, cluster_ids) per episode — sequences
[N, D] float arrays, cluster_ids length-N label lists.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tal_asrd_tpu.diarization.evals import evaluate_result
from tal_asrd_tpu.diarization.uisrnn import (
    UISRNN,
    UISRNNConfig,
    UISRNNInferenceConfig,
    UISRNNTrainConfig,
    output_result,
)


def load_feature_file(path: str) -> Tuple[List[np.ndarray], List[List[str]]]:
    with open(path, "rb") as f:
        return pickle.load(f)


def kfold_experiment(
    episodes: Sequence[Tuple[np.ndarray, Sequence[str]]],
    model_cfg: UISRNNConfig,
    train_cfg: UISRNNTrainConfig,
    infer_cfg: UISRNNInferenceConfig,
    k: int = 5,
    quick_test: bool = False,
    seed: int = 0,
):
    """k-fold CV: returns (mean_accuracy, per-fold records)."""
    episodes = list(episodes)
    if quick_test:
        episodes = episodes[: max(2, k)]
    n = len(episodes)
    folds = [episodes[i::k] for i in range(min(k, n))]
    records = []
    for fi, test_fold in enumerate(folds):
        train_eps = [e for fj, fold in enumerate(folds) if fj != fi for e in fold]
        model = UISRNN(model_cfg, seed=seed + fi)
        seqs = [np.asarray(s, float) for s, _ in train_eps]
        ids = [list(map(str, c)) for _, c in train_eps]
        tc = train_cfg
        if quick_test:
            tc = UISRNNTrainConfig(**{**train_cfg.__dict__, "quick_test": True})
        model.fit(seqs, ids, tc)
        for seq, gold in test_fold:
            seq = np.asarray(seq, float)
            if quick_test:
                seq, gold = seq[:20], list(gold)[:20]
            pred = model.predict_single(seq, infer_cfg)
            acc = evaluate_result(list(gold), pred)
            records.append((acc, len(gold)))
    mean_acc = float(np.mean([a for a, _ in records])) if records else 0.0
    print(output_result(model_cfg, train_cfg, records))
    return mean_acc, records


def streaming_fit(
    feature_files: Sequence[str],
    model_cfg: UISRNNConfig,
    train_cfg: UISRNNTrainConfig,
    checkpoint_path: str,
    files_per_batch: int = 10,
    resume: bool = True,
) -> UISRNN:
    """train_large-style streaming: fit over file batches, checkpoint after
    each batch, resume from the checkpoint + progress marker."""
    model = UISRNN(model_cfg)
    progress_path = checkpoint_path + ".progress"
    start = 0
    if resume and os.path.exists(checkpoint_path) and os.path.exists(progress_path):
        model.load(checkpoint_path)
        with open(progress_path) as f:
            start = int(f.read().strip())
        print(f"[uisrnn] resuming from batch {start}")

    batches = [
        feature_files[i : i + files_per_batch]
        for i in range(0, len(feature_files), files_per_batch)
    ]
    for bi in range(start, len(batches)):
        seqs, ids = [], []
        for path in batches[bi]:
            s, c = load_feature_file(path)
            if isinstance(s, list):
                seqs.extend(np.asarray(x, float) for x in s)
                ids.extend(list(map(str, x)) for x in c)
            else:
                seqs.append(np.asarray(s, float))
                ids.append(list(map(str, c)))
        model.fit(seqs, ids, train_cfg)
        model.save(checkpoint_path)
        with open(progress_path, "w") as f:
            f.write(str(bi + 1))
    return model

"""Diarization evaluation (uisrnn/evals.py:31-64 parity): optimal
sequence-match accuracy between predicted and ground-truth label sequences;
DER = 1 - accuracy."""
from __future__ import annotations

from typing import Sequence

from tal_asrd_tpu.eval.wder import compute_sequence_match


def evaluate_result(true_labels: Sequence, predicted_labels: Sequence) -> float:
    """Best-matching accuracy under the optimal label permutation."""
    _, _, accuracy = compute_sequence_match(list(true_labels), list(predicted_labels))
    return accuracy


def diarization_error_rate(true_labels: Sequence, predicted_labels: Sequence) -> float:
    return 1.0 - evaluate_result(true_labels, predicted_labels)

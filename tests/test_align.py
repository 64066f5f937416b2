"""Forced-alignment tests: DTW optimality on hand-checkable matrices, MFCC
geometry, and end-to-end utterance alignment contract (monotonic word times
within utterance bounds)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.align import (
    align_utterance,
    dtw_cost_matrix,
    dtw_path,
    mfcc,
    monotonic_segmentation,
)
from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.models import ASRModel
from tests.synthetic_corpus import build_tokenizer


def test_dtw_cost_matrix_known():
    cost = np.array([[1.0, 2.0], [3.0, 1.0]], np.float32)
    d = np.asarray(dtw_cost_matrix(jnp.asarray(cost)))
    # D = [[1, 3], [4, 2]]
    np.testing.assert_allclose(d, [[1, 3], [4, 2]])


def test_dtw_path_diagonal_preference():
    # identity-like cost: cheap diagonal
    cost = np.full((4, 4), 1.0, np.float32)
    np.fill_diagonal(cost, 0.0)
    path = dtw_path(cost)
    assert path[0] == (0, 0) and path[-1] == (3, 3)
    assert path == [(i, i) for i in range(4)]


def test_monotonic_segmentation_covers_all_columns():
    rng = np.random.RandomState(0)
    cost = rng.rand(5, 12).astype(np.float32)
    spans = monotonic_segmentation(cost)
    assert spans[0][0] == 0
    assert spans[-1][1] == 12
    for (a1, b1), (a2, b2) in zip(spans[:-1], spans[1:]):
        assert a1 < b1
        assert a2 >= b1 - 1  # monotone, overlapping by at most the corner


def test_mfcc_shape():
    cfg = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)
    out = np.asarray(mfcc(jnp.zeros((1, 3200)), cfg, n_mfcc=5))
    assert out.shape == (1, 101, 5)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_align_utterance_contract(tmp_path):
    tok = build_tokenizer(str(tmp_path), vocab_size=120)
    cfg = ModelConfig(
        model_type="1x", num_speakers=0, n_mels=8, vocab_size=len(tok),
        n_head=2, max_positions=64, dropout=0.0, embed_size=8,
        tds_depths=(1, 1, 1), tds_kernel=5,
    )
    fe = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)
    model = ASRModel(cfg, fe)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 16000)),
        jnp.zeros((1, 4), jnp.int32), jnp.array([16000]),
    )
    audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
    aligns = align_utterance(
        model, variables, tok, audio, "the quick brown fox", 10.0
    )
    words = "the quick brown fox".split()
    assert len(aligns) == len(words)
    last_end = 10.0
    for begin, end, ix in aligns:
        assert begin >= 10.0 and end > begin
        assert begin >= last_end - 0.081  # monotone up to one frame overlap
        last_end = end
    assert aligns[-1][1] <= 10.0 + len(audio) / 16000 + 0.1

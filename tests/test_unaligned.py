"""Unaligned (full-episode) decoder tests: invariants of the window state
machine on a tiny model — termination, alignment bookkeeping (one alignment
per generated token, system.py:401 assert), window monotonicity and bounds
(system.py:478-488 asserts), and jit-ability of the nested while_loops.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.decode.unaligned import UnalignedSpec, unaligned_decode
from tal_asrd_tpu.models import ASRModel

TINY = ModelConfig(
    model_type="1x",
    num_speakers=3,
    n_mels=8,
    vocab_size=16,
    n_head=2,
    max_positions=32,
    dropout=0.0,
    embed_size=8,
    tds_depths=(1, 1, 1),
    tds_kernel=5,
)
TINY_FRONTEND = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)
EOS = 1


@pytest.fixture(scope="module")
def setup():
    model = ASRModel(TINY, TINY_FRONTEND)
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, 48000)) * 0.1  # "3s"
    lens = jnp.array([48000])
    y = jnp.zeros((1, 4), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, audio, y, lens)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables
    )
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    enc_len = (~enc["encoder_padding_mask"][0]).sum()
    return model, variables, enc, enc_len


def run(setup, **kw):
    model, variables, enc, enc_len = setup
    spec = UnalignedSpec(
        eos_id=EOS,
        chunk_size=kw.pop("chunk_size", 48),
        max_positions=TINY.max_positions,
        stall_patience=kw.pop("stall_patience", 8),
        max_tokens=kw.pop("max_tokens", 128),
        max_iters=kw.pop("max_iters", 400),
        max_outer=kw.pop("max_outer", 64),
        **kw,
    )
    return spec, unaligned_decode(model, variables, enc, enc_len, spec)


def test_unaligned_terminates_and_counts(setup):
    spec, out = run(setup)
    n = int(out["num_tokens"])
    assert 1 < n <= spec.max_tokens
    toks = np.asarray(out["tokens"][0, :n])
    assert toks[0] == EOS
    assert (toks >= 0).all() and (toks < TINY.vocab_size + TINY.num_speakers).all()
    # One alignment per generated token (system.py:401)
    attn = np.asarray(out["align_attn"][: n - 1], np.float32)
    # Each attention row is a distribution over the window (sums ~1)
    sums = attn.sum(-1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-2)


def test_unaligned_window_bounds(setup):
    model, variables, enc, enc_len = setup
    spec, out = run(setup)
    n = int(out["num_tokens"])
    chunks = np.asarray(out["align_chunk"][: n - 1])
    # Window offsets are monotonically non-decreasing and clamped
    assert (np.diff(chunks) >= 0).all()
    assert chunks.max() <= max(int(enc_len) - spec.chunk_size, 0)
    assert chunks.min() >= 0


def test_unaligned_small_history_evict(setup):
    # Force the history-full path: tiny history cap with evict block 1
    # (the reference's slide-by-one behavior).
    spec, out = run(setup, history_evict_block=1, max_iters=200)
    assert int(out["num_tokens"]) > 1


def test_unaligned_jits(setup):
    model, variables, enc, enc_len = setup
    spec = UnalignedSpec(
        eos_id=EOS, chunk_size=48, max_positions=TINY.max_positions,
        stall_patience=8, max_tokens=64, max_iters=150, max_outer=32,
    )
    f = jax.jit(
        lambda v, e, n: unaligned_decode(model, v, e, n, spec)
    )
    out = f(variables, enc, enc_len)
    assert int(out["num_tokens"]) > 1

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


def run(setup, lm=None, lm_variables=None, **kw):
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
    return spec, unaligned_decode(model, variables, enc, enc_len, spec,
                                  lm=lm, lm_variables=lm_variables)


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


@pytest.mark.slow  # 22s; evict parity also measured in test_deviations.
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


# ---------------------------------------------------------------------------
# Extensions: eos_advance / stall_rollback (UnalignedSpec docstring; both
# default OFF = reference parity, covered by every test above)
# ---------------------------------------------------------------------------
def test_unaligned_eos_advance_invariants(setup):
    model, variables, enc, enc_len = setup
    spec, out = run(setup, eos_advance=True)
    n = int(out["num_tokens"])
    assert 1 < n <= spec.max_tokens
    chunks = np.asarray(out["align_chunk"][: n - 1])
    assert (np.diff(chunks) >= 0).all()
    assert chunks.max() <= max(int(enc_len) - spec.chunk_size, 0)


def test_unaligned_eos_advance_walks_windows(setup):
    """Force every emitted token to EOS via a strong LM prior: each step must
    fire the eos_advance event (window forward >= skip_amt) and the decode
    must terminate at the last window instead of waiting out stall_patience
    or the repetition detector."""
    model, variables, enc, enc_len = setup
    lm = _ConstLM(TINY.vocab_size, EOS)
    spec, out = run(setup, eos_advance=True, lm_weight=100.0,
                    text_vocab_size=TINY.vocab_size, lm=lm, lm_variables={})
    n = int(out["num_tokens"])
    toks = np.asarray(out["tokens"][0, :n])
    assert (toks == EOS).all()
    chunks = np.asarray(out["align_chunk"][: n - 1])
    last_start = max(int(enc_len) - spec.chunk_size, 0)
    skip_amt = int(spec.chunk_size * spec.skip_prct)
    # every step fires the event: the window strictly advances (by at least
    # skip_amt until the final clamp) and reaches the last window
    if len(chunks) > 1:
        assert (np.diff(chunks) >= 1).all()
        assert (np.diff(chunks)[:-1] >= min(skip_amt, 1)).all()
    assert chunks[-1] == last_start
    # termination came from eos-at-end, well inside the iteration budget
    assert int(out["iters"]) < spec.max_iters


def test_unaligned_stall_rollback_invariants(setup):
    """stall_rollback trims the unanchored tail on stall resets; the output
    must still satisfy every state-machine invariant and terminate."""
    model, variables, enc, enc_len = setup
    spec, out = run(setup, stall_rollback=True, stall_patience=4)
    n = int(out["num_tokens"])
    assert 1 < n <= spec.max_tokens
    toks = np.asarray(out["tokens"][0, :n])
    assert toks[0] == EOS
    assert (toks >= 0).all() and (toks < TINY.vocab_size + TINY.num_speakers).all()
    chunks = np.asarray(out["align_chunk"][: n - 1])
    assert (np.diff(chunks) >= 0).all()


# ---------------------------------------------------------------------------
# LM shallow fusion (system.py:368-384)
# ---------------------------------------------------------------------------
def _tiny_lm():
    from tal_asrd_tpu.core.config import LMConfig
    from tal_asrd_tpu.models.lm import DecoderLMModel

    cfg = LMConfig(vocab_size=TINY.vocab_size, hidden_size=16, n_head=2,
                   n_layers=1, max_positions=64, dropout=0.0)
    lm = DecoderLMModel(cfg)
    toks = jnp.zeros((1, 4), jnp.int32)
    lm_vars = lm.init({"params": jax.random.PRNGKey(7)}, toks)
    return lm, lm_vars


class _ConstLM:
    """Stub LM with a fixed favorite token — deterministic fusion direction."""

    def __init__(self, vocab: int, fav: int, scale: float = 100.0):
        self.logits = jnp.zeros((vocab,), jnp.float32).at[fav].set(scale)

    def apply(self, variables, *args, method=None):
        return method(self, *args)

    def decode_prefill(self, tokens, cache_len):
        b, p = tokens.shape
        v = self.logits.shape[0]
        return jnp.broadcast_to(self.logits, (b, p, v)), (jnp.zeros((1,)),)

    def decode_step(self, y_tok, caches, index):
        b = y_tok.shape[0]
        return jnp.broadcast_to(self.logits, (b, self.logits.shape[0])), caches


@pytest.mark.slow  # 50s; lm-fusion behavior covered fast by
# test_unaligned_lm_fusion_biases_output.
def test_unaligned_lm_weight_zero_matches_no_lm(setup):
    """Passing an LM with lm_weight=0 must be bit-identical to no LM."""
    lm, lm_vars = _tiny_lm()
    _, base = run(setup, max_iters=200)
    _, fused = run(setup, max_iters=200, lm_weight=0.0,
                   text_vocab_size=TINY.vocab_size, lm=lm, lm_variables=lm_vars)
    assert int(base["num_tokens"]) == int(fused["num_tokens"])
    n = int(base["num_tokens"])
    np.testing.assert_array_equal(
        np.asarray(base["tokens"][0, :n]), np.asarray(fused["tokens"][0, :n])
    )


def test_unaligned_lm_fusion_biases_output(setup):
    """A strong LM prior toward one token must suppress every OTHER text
    token; speaker tokens (outside the LM vocab) are never penalized —
    system.py:381-383 only adds over the LM's vocab width. So in the fused
    decode the only text tokens that can be emitted are the LM's favorite
    (EOS written by state-machine resets excepted), while the base decode
    emits other text tokens freely."""
    fav = 7
    lm = _ConstLM(TINY.vocab_size, fav)
    _, base = run(setup, max_iters=200)
    _, fused = run(setup, max_iters=200, lm_weight=10.0,
                   text_vocab_size=TINY.vocab_size, lm=lm, lm_variables={})
    toks_b = np.asarray(base["tokens"][0, 1:int(base["num_tokens"])])
    toks_f = np.asarray(fused["tokens"][0, 1:int(fused["num_tokens"])])
    text_f = toks_f[(toks_f < TINY.vocab_size) & (toks_f != EOS)]
    text_b = toks_b[(toks_b < TINY.vocab_size) & (toks_b != EOS)]
    assert (text_f == fav).all(), text_f
    # and the base decode does NOT have that property (the prior changed it)
    assert len(text_b) == 0 or not (text_b == fav).all() or not np.array_equal(
        toks_b, toks_f
    )


def test_unaligned_real_lm_runs(setup):
    """Fusion with the real DecoderLMModel (KV-cached prefill + steps) decodes
    to completion with valid tokens."""
    lm, lm_vars = _tiny_lm()
    spec, out = run(setup, max_iters=200, lm_weight=0.5,
                    text_vocab_size=TINY.vocab_size, lm=lm, lm_variables=lm_vars)
    n = int(out["num_tokens"])
    assert 1 < n <= spec.max_tokens
    toks = np.asarray(out["tokens"][0, :n])
    assert (toks >= 0).all() and (toks < TINY.vocab_size + TINY.num_speakers).all()

"""Reference-mode (non-causal) decode tests: the fixed-buffer masked
implementation must match a Python loop that re-decodes the exact-length
prefix each step (the reference's computation), and at init (ReZero identity)
it must agree with the causal cached path."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.decode.reference_mode import greedy_noncausal
from tal_asrd_tpu.models import ASRModel

TINY = ModelConfig(
    model_type="1x", num_speakers=3, n_mels=8, vocab_size=16, n_head=2,
    max_positions=32, dropout=0.0, embed_size=8, tds_depths=(1, 1, 1),
    tds_kernel=5,
)
FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)
EOS = 1


@pytest.fixture(scope="module")
def setup():
    model = ASRModel(TINY, FE)
    audio = jax.random.normal(jax.random.PRNGKey(0), (2, 4800)) * 0.1
    lens = jnp.array([4800, 4800])
    variables = model.init({"params": jax.random.PRNGKey(1)}, audio,
                           jnp.zeros((2, 4), jnp.int32), lens)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables
    )
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    return model, variables, enc


def py_noncausal_greedy(model, variables, enc, prime_row, max_len):
    """Exact-length re-decode per step (the reference loop, batch of 1)."""
    row = list(prime_row)
    enc1 = {k: (v[:1] if v is not None else None) for k, v in enc.items()}
    while len(row) < max_len:
        logits, _ = model.apply(
            variables, jnp.asarray([row], jnp.int32), enc1, False,
            method=ASRModel.decode,
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        row.append(nxt)
        if nxt == EOS:
            break
    return row


def test_noncausal_matches_exact_length_loop(setup):
    model, variables, enc = setup
    prime = jnp.full((2, 1), EOS, jnp.int32)
    out = greedy_noncausal(model, variables, enc, prime, max_len=10, eos_id=EOS)
    for i in range(2):
        ref_row = py_noncausal_greedy(
            model, variables,
            {k: (v[i : i + 1] if v is not None else None) for k, v in enc.items()},
            [EOS], 10,
        )
        got = list(np.asarray(out["tokens"][i, : int(out["lengths"][i])]))
        assert got == ref_row, (i, got, ref_row)


def test_noncausal_attn_rows_are_distributions(setup):
    model, variables, enc = setup
    prime = jnp.full((2, 1), EOS, jnp.int32)
    out = greedy_noncausal(model, variables, enc, prime, max_len=8, eos_id=None)
    attn = np.asarray(out["attn"])[:, 1:8]  # emitted positions
    sums = attn.sum(-1)
    np.testing.assert_allclose(sums, np.ones_like(sums), atol=1e-3)

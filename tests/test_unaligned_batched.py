"""Batched (vmapped) unaligned decode: each lane must match its standalone
single-episode run bit-for-bit — the guards freeze finished lanes while
slower lanes continue."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig
from tal_asrd_tpu.decode.unaligned import (
    UnalignedSpec,
    unaligned_decode,
    unaligned_decode_batched,
)
from tal_asrd_tpu.models import ASRModel

TINY = ModelConfig(
    model_type="1x", num_speakers=3, n_mels=8, vocab_size=16, n_head=2,
    max_positions=32, dropout=0.0, embed_size=8, tds_depths=(1, 1, 1),
    tds_kernel=5,
)
FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32,
                    mean_subtract=False)
EOS = 1


@pytest.mark.slow  # 90s bit-parity of the vmapped batch vs single lane;
# the single-lane machine is covered by test_unaligned.py in the fast tier.
def test_batched_matches_single():
    model = ASRModel(TINY, FE)
    # Two different-length episodes padded to a common length
    a1 = jax.random.normal(jax.random.PRNGKey(0), (48000,)) * 0.1
    a2 = jax.random.normal(jax.random.PRNGKey(1), (32000,)) * 0.1
    t = 48000
    audio = jnp.stack([a1, jnp.pad(a2, (0, t - len(a2)))])
    lens = jnp.array([48000, 32000])
    variables = model.init(
        {"params": jax.random.PRNGKey(2)}, audio[:1],
        jnp.zeros((1, 4), jnp.int32), lens[:1],
    )
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables
    )
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    enc_lens = (~enc["encoder_padding_mask"]).sum(axis=1)

    spec = UnalignedSpec(
        eos_id=EOS, chunk_size=48, max_positions=TINY.max_positions,
        stall_patience=6, max_tokens=96, max_iters=300, max_outer=48,
    )

    batched = unaligned_decode_batched(
        model, variables,
        {"encoder_out": enc["encoder_out"], "encoder_padding_mask": None},
        enc_lens, spec,
    )

    for i in range(2):
        single = unaligned_decode(
            model, variables,
            {"encoder_out": enc["encoder_out"][i : i + 1]},
            enc_lens[i], spec,
        )
        n_b = int(batched["num_tokens"][i])
        n_s = int(single["num_tokens"])
        assert n_b == n_s, (i, n_b, n_s)
        np.testing.assert_array_equal(
            np.asarray(batched["tokens"][i, :n_b]),
            np.asarray(single["tokens"][0, :n_s]),
        )
        np.testing.assert_allclose(
            np.asarray(batched["align_attn"][i, : n_b - 1], np.float32),
            np.asarray(single["align_attn"][: n_s - 1], np.float32),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(batched["align_chunk"][i, : n_b - 1]),
            np.asarray(single["align_chunk"][: n_s - 1]),
        )


@pytest.mark.slow
def test_batched_with_fused_model_matches_flax():
    """pallas_call under vmap (interpret mode): the lane-batched unaligned
    machine driven by FusedASRDecoder must produce the same per-lane token
    streams as the flax path — the semantic half of the BENCH_FUSED_UNALIGNED
    gate (Mosaic-under-vmap on real silicon remains sweep-gated)."""
    from tal_asrd_tpu.decode.fused_step import FusedASRDecoder

    model = ASRModel(TINY, FE)
    a1 = jax.random.normal(jax.random.PRNGKey(3), (32000,)) * 0.1
    a2 = jax.random.normal(jax.random.PRNGKey(4), (32000,)) * 0.1
    audio = jnp.stack([a1, a2])
    lens = jnp.array([32000, 32000])
    variables = model.init(
        {"params": jax.random.PRNGKey(5)}, audio[:1],
        jnp.zeros((1, 4), jnp.int32), lens[:1],
    )
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables
    )
    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    enc_lens = (~enc["encoder_padding_mask"]).sum(axis=1)
    spec = UnalignedSpec(
        eos_id=EOS, chunk_size=48, max_positions=TINY.max_positions,
        stall_patience=6, max_tokens=64, max_iters=200, max_outer=32,
    )
    enc_in = {"encoder_out": enc["encoder_out"], "encoder_padding_mask": None}
    out_r = unaligned_decode_batched(model, variables, enc_in, enc_lens, spec)
    fused = FusedASRDecoder(model, interpret=True)
    out_f = unaligned_decode_batched(fused, variables, enc_in, enc_lens, spec)
    for i in range(2):
        n_r = int(out_r["num_tokens"][i])
        n_f = int(out_f["num_tokens"][i])
        assert n_r == n_f, (i, n_r, n_f)
        np.testing.assert_array_equal(
            np.asarray(out_r["tokens"][i, :n_r]),
            np.asarray(out_f["tokens"][i, :n_f]))

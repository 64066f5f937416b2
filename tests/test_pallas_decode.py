"""Parity test: fused Pallas decoder layer-step kernel vs the flax
RZDecoderLayer with KV cache (interpret mode; runs on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.models.decoder import RZDecoderLayer
from tal_asrd_tpu.ops.pallas_decode import fused_layer_step, pack_layer

B, D, H, F, S, L = 4, 128, 2, 256, 32, 16


@pytest.fixture(scope="module")
def layer():
    ly = RZDecoderLayer(d_model=D, n_head=H, dim_feedforward=F, dropout=0.0,
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((B, 1, D))
    mem = jax.random.normal(jax.random.PRNGKey(1), (B, S, D)) * 0.3
    variables = ly.init(rng, x0, mem)
    # nonzero resweights so residual branches matter
    params = jax.tree_util.tree_map(
        lambda a: a + 0.5 if a.ndim == 0 else a, variables["params"]
    )
    return ly, params, mem


def test_fused_layer_step_matches_flax(layer):
    ly, params, mem = layer
    variables = {"params": params}
    mem_kv = ly.apply(variables, mem, method=RZDecoderLayer.precompute_mem_kv)
    mask = np.zeros((B, S), bool)
    mask[:, -5:] = True  # padded tail
    bias_flax = jnp.asarray(mask)
    bias_kernel = jnp.where(jnp.asarray(mask), -1e9, 0.0).astype(jnp.float32)

    cache = {
        "k": jnp.zeros((B, L, H, D // H)),
        "v": jnp.zeros((B, L, H, D // H)),
    }
    ck = jnp.zeros((B, L, D))
    cv = jnp.zeros((B, L, D))

    w = pack_layer(params, dtype=jnp.float32)
    xs = jax.random.normal(jax.random.PRNGKey(2), (3, B, D)) * 0.5

    for step in range(3):
        x = xs[step]
        ref_out, ref_attn, new_cache = ly.apply(
            variables, x[:, None, :], None,
            memory_key_padding_mask=bias_flax,
            self_cache=cache, cache_index=jnp.asarray(step, jnp.int32),
            mem_kv=mem_kv,
            method=RZDecoderLayer.__call__,
        )
        cache = new_cache

        out, attn, ck, cv = fused_layer_step(
            x, w, ck, cv,
            mem_kv["k"].reshape(B, S, D), mem_kv["v"].reshape(B, S, D),
            bias_kernel, jnp.asarray(step, jnp.int32), n_head=H,
            interpret=True,
        )

        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out[:, 0, :]), rtol=2e-4, atol=2e-4,
            err_msg=f"hidden mismatch at step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(attn), np.asarray(ref_attn[:, 0, :]), rtol=2e-4, atol=2e-4,
            err_msg=f"attn mismatch at step {step}",
        )
        # caches agree (flax [B,L,H,dh] vs kernel [B,L,D])
        np.testing.assert_allclose(
            np.asarray(ck), np.asarray(cache["k"]).reshape(B, L, D),
            rtol=2e-4, atol=2e-4,
        )


def test_fused_layer_step_batch_blocks(layer):
    """block_b grids the batch; results must match the unblocked kernel.

    Uses a 16-lane batch with block_b=4: Mosaic requires the blocked
    second-minor (batch) dim be a multiple of the 8-sublane tile, so the
    driver must round 4 up to 8 and still grid (grid=2) — the real chip
    rejected block 4 outright (PERF_SWEEP 2026-08-18)."""
    ly, params, mem = layer
    variables = {"params": params}
    mem_kv = ly.apply(variables, mem, method=RZDecoderLayer.precompute_mem_kv)
    w = pack_layer(params, dtype=jnp.float32)
    reps = 4  # tile the B=4 fixture to a 16-lane batch
    bb = B * reps
    bias = jnp.zeros((bb, S), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(3), (bb, D)) * 0.5
    mk = jnp.tile(mem_kv["k"].reshape(B, S, D), (reps, 1, 1))
    mv = jnp.tile(mem_kv["v"].reshape(B, S, D), (reps, 1, 1))

    args = lambda: (x, w, jnp.zeros((bb, L, D)), jnp.zeros((bb, L, D)),
                    mk, mv, bias, jnp.asarray(0, jnp.int32))
    o1 = fused_layer_step(*args(), n_head=H, interpret=True)
    for blk in (4, 8):  # 4 exercises the round-up, 8 the aligned path
        o2 = fused_layer_step(*args(), n_head=H, interpret=True, block_b=blk)
        for a, b_ in zip(o1, o2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-5, atol=1e-5)


def test_fused_layer_step_kv8_close_to_exact(layer):
    """int8 cross-K/V + per-channel scales (quantize_mem_kv): the only
    deviation from the exact kernel is the int8 rounding of K/V entries, so
    outputs must sit within a small absolute band of the unquantized run."""
    from tal_asrd_tpu.ops.pallas_decode import quantize_mem_kv

    ly, params, mem = layer
    variables = {"params": params}
    mem_kv = ly.apply(variables, mem, method=RZDecoderLayer.precompute_mem_kv)
    bias = jnp.zeros((B, S), jnp.float32)
    w = pack_layer(params, dtype=jnp.float32)
    mk = mem_kv["k"].reshape(B, S, D)
    mv = mem_kv["v"].reshape(B, S, D)
    k8, sk, v8, sv = quantize_mem_kv(mk, mv)
    assert k8.dtype == jnp.int8 and sk.shape == (D,)
    # dequantized reconstruction is ~1% relative on K/V entries
    rec = np.asarray(k8, np.float32) * np.asarray(sk)
    scale = np.abs(np.asarray(mk)).max()
    np.testing.assert_allclose(rec, np.asarray(mk), atol=scale / 120.0)

    x = jax.random.normal(jax.random.PRNGKey(7), (B, D)) * 0.5
    idx = jnp.asarray(0, jnp.int32)
    args = (x, w, jnp.zeros((B, L, D)), jnp.zeros((B, L, D)))
    out_e, attn_e, _, _ = fused_layer_step(
        *args, mk, mv, bias, idx, n_head=H, interpret=True)
    out_q, attn_q, _, _ = fused_layer_step(
        *args, k8, v8, bias, idx, n_head=H, interpret=True,
        mem_k_scale=sk, mem_v_scale=sv)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_e),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(attn_q), np.asarray(attn_e),
                               rtol=0.1, atol=0.02)


def test_fused_layer_step_w8_close_to_exact(layer):
    """int8 weights + per-output-channel scales (quantize_packed): the only
    deviation from the exact kernel is the int8 rounding of weight entries,
    so outputs must sit within a small band of the unquantized run."""
    from tal_asrd_tpu.ops.pallas_decode import quantize_packed

    ly, params, mem = layer
    variables = {"params": params}
    mem_kv = ly.apply(variables, mem, method=RZDecoderLayer.precompute_mem_kv)
    bias = jnp.zeros((B, S), jnp.float32)
    w = pack_layer(params, dtype=jnp.float32)
    w8 = quantize_packed(w)
    assert w8["wqkv"].dtype == jnp.int8 and w8["sqkv"].shape == (3 * D,)
    assert w8["wf1"].dtype == jnp.int8 and w8["sf1"].shape == (F,)
    # dequantized reconstruction is ~0.8% relative on the weight entries
    rec = np.asarray(w8["wqkv"], np.float32) * np.asarray(w8["sqkv"])[None, :]
    scale = np.abs(np.asarray(w["wqkv"])).max()
    np.testing.assert_allclose(rec, np.asarray(w["wqkv"]), atol=scale / 120.0)

    mk = mem_kv["k"].reshape(B, S, D)
    mv = mem_kv["v"].reshape(B, S, D)
    x = jax.random.normal(jax.random.PRNGKey(9), (B, D)) * 0.5
    idx = jnp.asarray(0, jnp.int32)
    caches = lambda: (jnp.zeros((B, L, D)), jnp.zeros((B, L, D)))
    out_e, attn_e, _, _ = fused_layer_step(
        x, w, *caches(), mk, mv, bias, idx, n_head=H, interpret=True)
    out_q, attn_q, _, _ = fused_layer_step(
        x, w8, *caches(), mk, mv, bias, idx, n_head=H, interpret=True)
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(out_e),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(attn_q), np.asarray(attn_e),
                               rtol=0.1, atol=0.02)

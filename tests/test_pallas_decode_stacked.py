"""Parity: the EXPERIMENTAL all-layers stacked decode kernel
(ops/pallas_decode_stacked.py) vs the proven per-layer kernel chain
(ops/pallas_decode.py), interpret mode. Pins that the grid-accumulator
layout (layer minormost, x/attn revisiting constant-indexed output blocks)
computes the exact same stack step before any silicon attempt in round 5."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.models.decoder import RZDecoderLayer
from tal_asrd_tpu.ops.pallas_decode import (
    fused_layer_step,
    pack_decoder,
    quantize_mem_kv,
    quantize_packed,
)
from tal_asrd_tpu.ops.pallas_decode_stacked import (
    pack_decoder_stacked,
    stacked_decoder_step,
)

B, D, H, F, S, CAP, L = 4, 128, 2, 256, 32, 16, 3


@pytest.fixture(scope="module")
def stack():
    ly = RZDecoderLayer(d_model=D, n_head=H, dim_feedforward=F, dropout=0.0,
                        dtype=jnp.float32)
    x0 = jnp.zeros((B, 1, D))
    mem = jax.random.normal(jax.random.PRNGKey(1), (B, S, D)) * 0.3
    decoder_params = {}
    mem_kvs = []
    for li in range(L):
        variables = ly.init(jax.random.PRNGKey(10 + li), x0, mem)
        params = jax.tree_util.tree_map(
            lambda a: a + 0.4 if a.ndim == 0 else a, variables["params"])
        decoder_params[f"layers_{li}"] = params
        kv = ly.apply({"params": params}, mem,
                      method=RZDecoderLayer.precompute_mem_kv)
        mem_kvs.append({"k": kv["k"].reshape(B, S, D),
                        "v": kv["v"].reshape(B, S, D)})
    return decoder_params, mem_kvs


def _chain(decoder_params, mem_kvs, xs, bias, w8):
    """Reference: the proven per-layer kernel, layers chained per token."""
    packed = pack_decoder(decoder_params, L, dtype=jnp.float32)
    if w8:
        packed = tuple(quantize_packed(w) for w in packed)
    cks = [jnp.zeros((B, CAP, D)) for _ in range(L)]
    cvs = [jnp.zeros((B, CAP, D)) for _ in range(L)]
    outs = []
    for step in range(xs.shape[0]):
        x = xs[step]
        attn_sum = None
        for li in range(L):
            x, attn, cks[li], cvs[li] = fused_layer_step(
                x, packed[li], cks[li], cvs[li],
                mem_kvs[li]["k"], mem_kvs[li]["v"], bias,
                jnp.asarray(step, jnp.int32), n_head=H, interpret=True)
            attn_sum = attn if attn_sum is None else attn_sum + attn
        outs.append((x, attn_sum / L))
    return outs, cks, cvs


def _stacked(decoder_params, mem_kvs, xs, bias, w8, block_b=None,
             kv8=False):
    stacked = pack_decoder_stacked(decoder_params, L, dtype=jnp.float32,
                                   w8=w8)
    mk = jnp.stack([kv["k"] for kv in mem_kvs])
    mv = jnp.stack([kv["v"] for kv in mem_kvs])
    ks = vs = None
    if kv8:
        qs = [quantize_mem_kv(kv["k"], kv["v"]) for kv in mem_kvs]
        mk = jnp.stack([q[0] for q in qs])
        ks = jnp.stack([q[1] for q in qs])
        mv = jnp.stack([q[2] for q in qs])
        vs = jnp.stack([q[3] for q in qs])
    ck = jnp.zeros((L, B, CAP, D))
    cv = jnp.zeros((L, B, CAP, D))
    outs = []
    for step in range(xs.shape[0]):
        x, attn, ck, cv = stacked_decoder_step(
            xs[step], stacked, ck, cv, mk, mv, bias,
            jnp.asarray(step, jnp.int32), n_head=H,
            mem_k_scale=ks, mem_v_scale=vs,
            interpret=True, block_b=block_b)
        outs.append((x, attn))
    return outs, ck, cv


def test_stacked_matches_layer_chain(stack):
    decoder_params, mem_kvs = stack
    xs = jax.random.normal(jax.random.PRNGKey(2), (3, B, D)) * 0.5
    bias = jnp.zeros((B, S), jnp.float32)
    ref, cks, cvs = _chain(decoder_params, mem_kvs, xs, bias, w8=False)
    got, ck, cv = _stacked(decoder_params, mem_kvs, xs, bias, w8=False)
    for step, ((xr, ar), (xg, ag)) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(xg), np.asarray(xr),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"hidden step {step}")
        np.testing.assert_allclose(np.asarray(ag), np.asarray(ar),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"attn step {step}")
    for li in range(L):
        np.testing.assert_allclose(np.asarray(ck[li]), np.asarray(cks[li]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(cv[li]), np.asarray(cvs[li]),
                                   rtol=2e-4, atol=2e-4)


def test_stacked_batch_blocks_and_w8(stack):
    """Batch-blocked grid (the VMEM-fitting configuration) with int8 weights
    + int8 cross-K/V must match the per-layer w8 chain within the same band
    the single-layer kv8/w8 tests use."""
    decoder_params, mem_kvs = stack
    xs = jax.random.normal(jax.random.PRNGKey(3), (2, B, D)) * 0.5
    bias = jnp.zeros((B, S), jnp.float32)
    ref, _, _ = _chain(decoder_params, mem_kvs, xs, bias, w8=True)
    got, _, _ = _stacked(decoder_params, mem_kvs, xs, bias, w8=True,
                         block_b=2, kv8=True)
    for step, ((xr, ar), (xg, ag)) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(np.asarray(xg), np.asarray(xr),
                                   rtol=0.05, atol=0.05,
                                   err_msg=f"hidden step {step}")
        np.testing.assert_allclose(np.asarray(ag), np.asarray(ar),
                                   rtol=0.1, atol=0.02,
                                   err_msg=f"attn step {step}")

"""EXPERIMENTAL: all-layers fused decoder step — one pallas_call per token.

The per-(layer, token) kernel (ops/pallas_decode.py) leaves two costs on the
table at decode time:

  * 4 kernel launches per token and 3 HBM round-trips of the [B, D] hidden
    between them;
  * each launch stalls on its own weight DMA before compute starts (~8.5 us
    for a 7 MB bf16 2x layer at 819 GB/s; ~4 us int8).

This kernel stacks the layers into the grid — ``grid = (batch_blocks,
n_layers)`` with the LAYER dimension minormost — so Mosaic's automatic
double-buffering prefetches layer l+1's weight/K/V blocks while layer l
computes, hiding the DMA behind the MXU, and the hidden state never leaves
VMEM between layers (it rides the constant-indexed x_out block, the standard
grid-accumulator pattern).

VMEM plan (v5e ~16 MB/core, all per-layer blocks double-buffered): the
stacked step only fits in the int8 configuration — w8 weights ~3.5 MB x2 +
kv8 cross-K/V at block_b<=4 ~1.5 MB x2 + self cache ~0.8 MB x2 + hidden/bias
~1 MB ~= 13 MB. bf16 weights (2x7 MB) blow the budget at any useful block, so
``quantize_packed`` (w8) is a prerequisite, not an option, for this kernel.

Status: interpret-mode parity vs the per-layer kernel chain
(tests/test_pallas_decode_stacked.py). NOT wired into bench/sweep — the
single-layer kernel must prove itself on silicon first (one unproven Mosaic
kernel per round); driver integration is round-5 work.

Reference hot loop being replaced: same as ops/pallas_decode.py —
/root/reference/tal/asr/system.py:109-114,350-387 re-decodes the full prefix
per token on host; there is no kernel to port, this is the TPU-native design.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tal_asrd_tpu.ops.pallas_decode import NEG_INF, pack_layer, quantize_packed

_W_KEYS = ("wqkv", "wso", "wcq", "wco", "wf1", "wf2")
_B_KEYS = ("bqkv", "bso", "bcq", "bco", "bf1", "bf2")
_S_KEYS = ("sqkv", "sso", "scq", "sco", "sf1", "sf2")


def pack_decoder_stacked(decoder_params: Dict, n_layers: int,
                         dtype=jnp.bfloat16, w8: bool = False) -> Dict:
    """Stack per-layer packed weights along a new leading layer axis.

    Returns {key: [L, ...]} for the kernel's layer-indexed BlockSpecs; with
    w8, matmul weights are int8 and per-output-channel scales ride under the
    s* keys (all-ones otherwise, so the kernel signature is uniform).
    """
    layers = [pack_layer(decoder_params[f"layers_{li}"], dtype)
              for li in range(n_layers)]
    if w8:
        layers = [quantize_packed(w) for w in layers]
    out: Dict[str, jax.Array] = {}
    for wk in _W_KEYS + _B_KEYS:
        out[wk] = jnp.stack([w[wk] for w in layers])
    for wk, sk in zip(_W_KEYS, _S_KEYS):
        ones = jnp.ones((layers[0][wk].shape[-1],), jnp.float32)
        out[sk] = jnp.stack([w.get(sk, ones) for w in layers])
    out["rw"] = jnp.stack([
        jnp.stack([w["resweight"], w["resweight_src"]]).astype(jnp.float32)
        for w in layers
    ])  # [L, 2]
    return out


def _stacked_step_kernel(
    idx_ref,                    # scalar prefetch: [1] cache write index
    x_ref,                      # [blk, D] layer-0 input
    wqkv_ref, bqkv_ref,         # [1, D, 3D], [1, 1, 3D]   (layer-indexed)
    wso_ref, bso_ref,
    wcq_ref, bcq_ref,
    wco_ref, bco_ref,
    wf1_ref, bf1_ref,
    wf2_ref, bf2_ref,
    rw_ref,                     # SMEM [L, 2] f32 (whole array; indexed by il)
    ck_in_ref, cv_in_ref,       # [1, blk, cap, D] (aliased)
    memk_ref, memv_ref,         # [1, blk, S, D] (bf16/f32 or int8)
    membias_ref,                # [blk, S] f32
    sk_ref, sv_ref,             # [1, 1, D] f32 cross-K/V dequant scales
    sqkv_ref, sso_ref, scq_ref, sco_ref, sf1_ref, sf2_ref,  # [1, 1, odim]
    # outputs
    x_out_ref,                  # [blk, D]  accumulator across layers
    attn_out_ref,               # [blk, S] f32 accumulator (mean over layers)
    ck_out_ref, cv_out_ref,     # aliased caches
    *,
    n_head: int,
):
    del ck_in_ref, cv_in_ref
    il = pl.program_id(1)
    n_layers = pl.num_programs(1)
    idx = idx_ref[0]
    f32 = jnp.float32

    @pl.when(il == 0)
    def _seed():
        x_out_ref[:] = x_ref[:]
        attn_out_ref[:] = jnp.zeros(attn_out_ref.shape, attn_out_ref.dtype)

    x = x_out_ref[:]
    b, d = x.shape
    h = n_head
    dh = d // h
    scale = 1.0 / (dh ** 0.5)

    # ---- self-attention (fused QKV over the cached history) -------------
    qkv = jnp.dot(x, wqkv_ref[0].astype(x.dtype), preferred_element_type=f32)
    qkv = qkv * sqkv_ref[0, 0][None, :] + bqkv_ref[0, 0][None, :]
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    # Masked full-ref cache write: Mosaic rejects dynamic-index stores into
    # the tiled second-minor (cap) dim (same fix as pallas_decode.py; the
    # block round-trips the whole cache slab per grid step anyway).
    cap = ck_out_ref.shape[2]
    at_idx = jax.lax.broadcasted_iota(jnp.int32, (1, cap, 1), 1) == idx
    ck = jnp.where(at_idx, k[:, None, :].astype(f32),
                   ck_out_ref[0].astype(f32))       # [B, cap, D]
    cv = jnp.where(at_idx, v[:, None, :].astype(f32),
                   cv_out_ref[0].astype(f32))
    ck_out_ref[0] = ck.astype(ck_out_ref.dtype)
    cv_out_ref[0] = cv.astype(cv_out_ref.dtype)
    pos_ok = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1) <= idx

    # Heads gathered by concatenation (dh is lane-aligned): .at[].set lowers
    # to scatter, which Mosaic rejects (same fix as pallas_decode.py).
    sa_heads = []
    for hi in range(h):
        sl = slice(hi * dh, (hi + 1) * dh)
        qh = q[:, sl] * scale
        logits = jnp.sum(qh[:, None, :] * ck[:, :, sl], -1)
        logits = jnp.where(pos_ok, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        sa_heads.append(jnp.sum(p[:, :, None] * cv[:, :, sl], 1))
    sa = jnp.concatenate(sa_heads, axis=-1)

    sa = jnp.dot(sa.astype(x.dtype), wso_ref[0].astype(x.dtype),
                 preferred_element_type=f32)
    sa = sa * sso_ref[0, 0][None, :] + bso_ref[0, 0][None, :]
    rw = rw_ref[il, 0]
    rw_src = rw_ref[il, 1]
    x1 = x.astype(f32) + sa * rw

    # ---- cross-attention over the per-layer window K/V -------------------
    qc = jnp.dot(x1.astype(x.dtype), wcq_ref[0].astype(x.dtype),
                 preferred_element_type=f32)
    qc = qc * scq_ref[0, 0][None, :] + bcq_ref[0, 0][None, :]
    memk = memk_ref[0].astype(f32) * sk_ref[0, 0][None, None, :]
    memv = memv_ref[0].astype(f32) * sv_ref[0, 0][None, None, :]
    bias = membias_ref[:]
    s = memk.shape[1]
    ca_heads = []
    attn_acc = jnp.zeros((b, s), f32)
    for hi in range(h):
        sl = slice(hi * dh, (hi + 1) * dh)
        qh = qc[:, sl] * scale
        logits = jnp.sum(qh[:, None, :] * memk[:, :, sl], -1) + bias
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        attn_acc = attn_acc + p
        ca_heads.append(jnp.sum(p[:, :, None] * memv[:, :, sl], 1))
    ca = jnp.concatenate(ca_heads, axis=-1)        # scatter-free

    attn_out_ref[:] += attn_acc / (h * n_layers)   # mean over heads AND layers
    ca = jnp.dot(ca.astype(x.dtype), wco_ref[0].astype(x.dtype),
                 preferred_element_type=f32)
    ca = ca * sco_ref[0, 0][None, :] + bco_ref[0, 0][None, :]
    x2 = x1 + ca * rw_src

    # ---- feed-forward -----------------------------------------------------
    ffh = jnp.dot(x2.astype(x.dtype), wf1_ref[0].astype(x.dtype),
                  preferred_element_type=f32)
    ffh = jnp.maximum(ffh * sf1_ref[0, 0][None, :] + bf1_ref[0, 0][None, :], 0.0)
    ff = jnp.dot(ffh.astype(x.dtype), wf2_ref[0].astype(x.dtype),
                 preferred_element_type=f32)
    ff = ff * sf2_ref[0, 0][None, :] + bf2_ref[0, 0][None, :]
    x3 = x2 + ff * rw

    x_out_ref[:] = x3.astype(x_out_ref.dtype)


def stacked_decoder_step(
    x: jax.Array,                    # [B, D]
    stacked: Dict[str, jax.Array],   # pack_decoder_stacked output
    cache_k: jax.Array,              # [L, B, cap, D] (consumed/aliased)
    cache_v: jax.Array,
    mem_k: jax.Array,                # [L, B, S, D]
    mem_v: jax.Array,
    mem_bias: jax.Array,             # [B, S] f32
    index: jax.Array,                # [] int32
    n_head: int,
    mem_k_scale: Optional[jax.Array] = None,   # [L, D] (kv8)
    mem_v_scale: Optional[jax.Array] = None,
    interpret: bool = False,
    block_b: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One full decoder stack step in ONE pallas_call.

    Returns (x_out [B, D], attn mean over layers+heads [B, S], new_ck, new_cv).
    Cache buffers are consumed (aliased to the outputs).
    """
    b, d = x.shape
    n_layers, _, s, _ = mem_k.shape
    cap = cache_k.shape[2]
    f_dim = stacked["wf1"].shape[-1]
    if mem_k_scale is None:
        mem_k_scale = jnp.ones((n_layers, d), jnp.float32)
    if mem_v_scale is None:
        mem_v_scale = jnp.ones((n_layers, d), jnp.float32)
    if block_b is None or block_b >= b:
        blk, nb = b, 1
    else:
        # Mosaic: a BLOCKED second-minor dim must be a multiple of the
        # 8-sublane tile; the x/attn blocks put the batch there. Round up
        # (same fix as pallas_decode.fused_layer_step; the real chip rejects
        # block 4). NOTE this doubles the VMEM floor of the module-docstring
        # plan, which assumed block 4 — the kv8+w8 configuration must be
        # re-budgeted at block 8 before any silicon run.
        block_b = max(8, -(-block_b // 8) * 8)
        while b % block_b:
            block_b += 8
        if block_b >= b:
            blk, nb = b, 1
        else:
            blk, nb = block_b, b // block_b

    # grid: batch-block OUTER, layer MINORMOST — x_out/attn_out revisit the
    # same block across consecutive layer steps (grid-accumulator pattern),
    # and Mosaic prefetches layer l+1's weight/KV blocks during layer l.
    grid = (nb, n_layers)
    def layer_3d(a):  # per-layer block, constant over batch blocks
        nd = a.ndim
        return pl.BlockSpec((1,) + a.shape[1:],
                            lambda jb, il, *_, nd=nd: (il,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    def lane_4d(a):   # per-(layer, batch-block) block
        nd = a.ndim
        return pl.BlockSpec((1, blk) + a.shape[2:],
                            lambda jb, il, *_, nd=nd: (il, jb) + (0,) * (nd - 2),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((blk, d), lambda jb, il, *_: (jb, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((blk, s), lambda jb, il, *_: (jb, 0),
                             memory_space=pltpu.VMEM)

    biases = {k: stacked[k].reshape(n_layers, 1, -1) for k in _B_KEYS}
    scales = {k: stacked[k].reshape(n_layers, 1, -1) for k in _S_KEYS}
    kscale = mem_k_scale.reshape(n_layers, 1, d).astype(jnp.float32)
    vscale = mem_v_scale.reshape(n_layers, 1, d).astype(jnp.float32)

    in_specs = (
        [x_spec]
        + [layer_3d(a) for pair in zip(
            (stacked[k] for k in _W_KEYS),
            (biases[k] for k in _B_KEYS)) for a in pair]
        # rw rides whole in SMEM (block == array shape): a (1, 2) layer slice
        # violates Mosaic's (8, 128)-divisibility rule on real TPUs (the
        # silicon wall of 2026-08-19); the kernel indexes rw_ref[il] instead.
        + [pl.BlockSpec(stacked["rw"].shape, lambda jb, il, *_: (0, 0),
                        memory_space=pltpu.SMEM)]                   # rw
        + [lane_4d(cache_k), lane_4d(cache_v)]
        + [lane_4d(mem_k), lane_4d(mem_v)]
        + [bias_spec]
        + [layer_3d(kscale), layer_3d(vscale)]
        + [layer_3d(scales[k]) for k in _S_KEYS]
    )
    out_specs = [
        x_spec,
        bias_spec,
        lane_4d(cache_k),
        lane_4d(cache_v),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, d), x.dtype),
        jax.ShapeDtypeStruct((b, s), jnp.float32),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid,
        in_specs=in_specs, out_specs=out_specs,
    )
    # flattened inputs: 0:idx 1:x 2..13:w/b 14:rw 15:ck 16:cv 17:memk 18:memv
    #                   19:bias 20:sk 21:sv 22..27:w-scales
    x_out, attn, ck, cv = pl.pallas_call(
        functools.partial(_stacked_step_kernel, n_head=n_head),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={15: 2, 16: 3},
        interpret=interpret,
        # Same cap as the per-layer kernel (pallas_decode.py): the resident
        # working set exceeds Mosaic's 16 MB scoped-VMEM DEFAULT once the
        # pipeliner double-buffers the full-shape blocks — on the remote AOT
        # backend that overflow surfaced as a compile-helper subprocess crash
        # (silicon bisect 2026-08-20: S=357/cap=104 fails from ~12 grid
        # steps, tiny shapes always pass). v5e has 128 MB physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        jnp.asarray(index, jnp.int32).reshape(1),
        x,
        stacked["wqkv"], biases["bqkv"],
        stacked["wso"], biases["bso"],
        stacked["wcq"], biases["bcq"],
        stacked["wco"], biases["bco"],
        stacked["wf1"], biases["bf1"],
        stacked["wf2"], biases["bf2"],
        stacked["rw"],
        cache_k, cache_v,
        mem_k, mem_v,
        mem_bias.astype(jnp.float32),
        kscale, vscale,
        *[scales[k] for k in _S_KEYS],
    )
    return x_out, attn, ck, cv

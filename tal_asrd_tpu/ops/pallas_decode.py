"""Fused decoder layer-step Pallas kernel: one kernel per (layer, token).

Why: the KV-cached decode step (models/asr.py decode_step) lowers to ~90 XLA
ops per token across 4 layers — on tiny [B, 512] tensors each op is launch/
latency-bound, not bandwidth- or compute-bound, so the while_loop decode
(decode/beam.py, decode/unaligned.py) runs far below speed-of-light (r2 bench:
7% MFU headline, 906 audio-h/h unaligned at B=1). This kernel fuses an entire
ReZero decoder layer step — fused-QKV self-attention over the KV cache
(in-place cache update via input_output_aliases), cross-attention over the
precomputed encoder window K/V, and the feed-forward — into ONE pallas_call,
cutting per-token kernel count by ~10x.

Parity: semantics follow models/decoder.py RZDecoderLayer with a cache
(causal bias over positions <= index, f32 softmax, mean-head cross-attn
weights returned for the unaligned progress tracker); tests/test_pallas_decode
checks allclose against the flax layer in interpret mode.

Memory plan (v5e, ~16 MB VMEM): weights for one 2x layer are ~7 MB bf16 and
the self-attn cache slice a few MB — both live fully in VMEM. The cross-attn
K/V for a 357-frame window must also fit beside them, which bounds the batch
block (B x S x D x 2 x 2 bytes); the decode paths use B<=64 per block.

Reference hot loop being replaced: the reference re-decodes the full prefix
per token in Python (tal/asr/system.py:109-114,350-387) — no kernel to port;
this is the TPU-native design for the same computation.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _layer_step_kernel(
    # scalar prefetch
    idx_ref,                    # [1] int32: cache write index
    # inputs (VMEM unless noted)
    x_ref,                      # [B, D] activations
    wqkv_ref, bqkv_ref,         # [D, 3D], [1, 3D]
    wso_ref, bso_ref,           # [D, D], [1, D]   self out proj
    wcq_ref, bcq_ref,           # [D, D], [1, D]   cross q proj
    wco_ref, bco_ref,           # [D, D], [1, D]   cross out proj
    wf1_ref, bf1_ref,           # [D, F], [1, F]
    wf2_ref, bf2_ref,           # [F, D], [1, D]
    rw_ref,                     # SMEM [1, 2] f32: (resweight, resweight_src)
    ck_in_ref, cv_in_ref,       # [B, L, D] self KV cache (aliased to outputs)
    memk_ref, memv_ref,         # [B, S, D] cross K/V (bf16/f32 OR int8)
    membias_ref,                # [B, S] f32 additive mask (0 / -inf)
    sk_ref, sv_ref,             # [1, D] f32 per-channel cross-K/V dequant
                                #   scales (all-ones for unquantized K/V)
    sqkv_ref, sso_ref,          # [1, 3D], [1, D] f32 per-output-channel
    scq_ref, sco_ref,           # [1, D], [1, D]    weight dequant scales
    sf1_ref, sf2_ref,           # [1, F], [1, D]    (all-ones for bf16 weights)
    # outputs
    x_out_ref,                  # [B, D]
    attn_out_ref,               # [B, S] f32 mean-head cross weights
    ck_out_ref, cv_out_ref,     # aliased cache outputs
    *,
    n_head: int,
):
    del ck_in_ref, cv_in_ref    # aliased: ck_out/cv_out refs hold the data
    idx = idx_ref[0]
    x = x_ref[:]                                    # [B, D]
    b, d = x.shape
    h = n_head
    dh = d // h
    f32 = jnp.float32
    cdt = x.dtype               # dot compute dtype (bf16 in production)
    scale = 1.0 / (dh ** 0.5)

    # ---- self-attention: fused QKV -------------------------------------
    # Weight matmuls dequantize through per-output-channel scales: the scale
    # folds exactly after the dot ((x @ W8)[:, j] * s_j == x @ (W8 * s)[:, j]),
    # so int8 weight storage (quantize_packed, w8) halves the step's weight
    # HBM read with only the int8 rounding as numeric deviation. For bf16
    # weights every scale is 1.0 and the astype below is a no-op.
    qkv = jnp.dot(x, wqkv_ref[:].astype(x.dtype), preferred_element_type=f32)
    qkv = qkv * sqkv_ref[0][None, :] + bqkv_ref[0][None, :]
    q, k, v = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]

    # In-place cache update at position idx, as a MASKED FULL-REF write in
    # the CACHE dtype: a dynamic-index store into the tiled second-minor (L)
    # dim is rejected by Mosaic ("cannot statically prove that index ... is
    # a multiple of 8"), and upcasting the whole cache to f32 blew the 16 MB
    # scoped-VMEM stack (both measured on silicon, 2026-08-18). The block
    # already round-trips the entire cache block per step, so the masked
    # rewrite adds no HBM traffic.
    l_buf = ck_out_ref.shape[1]
    at_idx = jax.lax.broadcasted_iota(jnp.int32, (1, l_buf, 1), 1) == idx
    ck = jnp.where(at_idx, k[:, None, :].astype(ck_out_ref.dtype),
                   ck_out_ref[:])                   # [B, L, D] cache dtype
    cv = jnp.where(at_idx, v[:, None, :].astype(cv_out_ref.dtype),
                   cv_out_ref[:])
    ck_out_ref[:] = ck
    cv_out_ref[:] = cv
    pos_ok = jax.lax.broadcasted_iota(jnp.int32, (1, l_buf), 1) <= idx

    # Per-head outputs are gathered by CONCATENATION, not .at[].set — the
    # scatter that lowers to is unimplemented in Mosaic (the real chip
    # rejected it); dh is lane-aligned (128) so the concat is tile-exact.
    # Attention contractions run as broadcast-multiply + f32 reductions on
    # the VPU, NOT dot_general: a dot with batch dimensions fails Mosaic's
    # TPU_DotDimensionNumbersAttr parse outright (silicon 2026-08-18), and
    # these are tiny [B_blk, L, dh] contractions — the MXU FLOPs of this
    # kernel are the 2D weight matmuls. Products in the stored compute dtype
    # with f32 accumulation = the MXU's own numeric contract.
    sa_heads = []
    for hi in range(h):
        sl = slice(hi * dh, (hi + 1) * dh)
        qh = (q[:, sl] * scale).astype(cdt)                 # [B, dh]
        logits = jnp.sum(ck[:, :, sl].astype(cdt) * qh[:, None, :],
                         axis=2, dtype=f32)                 # [B, L]
        logits = jnp.where(pos_ok, logits, NEG_INF)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)          # f32 [B, L]
        # Minor-dim insert happens on the f32 probs (Mosaic: "Insertion of
        # minor dim that is not a no-op only supported for 32-bit types",
        # silicon 2026-08-18), THEN casts — elementwise identical to casting
        # first.
        sa_heads.append(jnp.sum(
            p[:, :, None].astype(cdt) * cv[:, :, sl].astype(cdt),
            axis=1, dtype=f32))                             # [B, dh]
    sa = jnp.concatenate(sa_heads, axis=-1)                 # [B, D]

    sa = jnp.dot(sa.astype(x.dtype), wso_ref[:].astype(x.dtype),
                 preferred_element_type=f32)
    sa = sa * sso_ref[0][None, :] + bso_ref[0][None, :]
    rw = rw_ref[0, 0]
    rw_src = rw_ref[0, 1]
    x1 = x.astype(f32) + sa * rw                    # [B, D] f32

    # ---- cross-attention over the precomputed window K/V ----------------
    qc = jnp.dot(x1.astype(x.dtype), wcq_ref[:].astype(x.dtype),
                 preferred_element_type=f32)
    qc = qc * scq_ref[0][None, :] + bcq_ref[0][None, :]
    # Dequant scales fold into the per-head dots EXACTLY (they are
    # per-channel): the K scale folds into the query before the logits dot,
    # the V scale folds after the prob-weighted sum — so the int8 (or bf16)
    # cross-K/V is consumed in its STORED dtype and never materialized as an
    # f32 copy (the f32 upcast of the full window K/V was 11 MB of kernel
    # stack at block 8 and OOM'd the 16 MB scoped VMEM, silicon 2026-08-18).
    # The cross-K/V re-read remains the dominant HBM traffic of the step
    # (~190 MB/step at B=32 bench shapes) — int8 storage halves it vs bf16.
    bias = membias_ref[:]                           # [B, S]
    s = memk_ref.shape[1]
    ca_heads = []
    attn_acc = jnp.zeros((b, s), f32)
    for hi in range(h):
        sl = slice(hi * dh, (hi + 1) * dh)
        qh = (qc[:, sl] * scale * sk_ref[0][sl][None, :]).astype(cdt)
        logits = jnp.sum(memk_ref[:, :, sl].astype(cdt) * qh[:, None, :],
                         axis=2, dtype=f32) + bias  # [B, S]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)  # f32 [B, S]
        attn_acc = attn_acc + p
        pv = jnp.sum(
            p[:, :, None].astype(cdt) * memv_ref[:, :, sl].astype(cdt),
            axis=1, dtype=f32)                      # [B, dh]
        ca_heads.append(pv * sv_ref[0][sl][None, :])
    ca = jnp.concatenate(ca_heads, axis=-1)         # [B, D] (scatter-free)

    attn_out_ref[:] = attn_acc / h                  # mean over heads
    ca = jnp.dot(ca.astype(x.dtype), wco_ref[:].astype(x.dtype),
                 preferred_element_type=f32)
    ca = ca * sco_ref[0][None, :] + bco_ref[0][None, :]
    x2 = x1 + ca * rw_src

    # ---- feed-forward ----------------------------------------------------
    ffh = jnp.dot(x2.astype(x.dtype), wf1_ref[:].astype(x.dtype),
                  preferred_element_type=f32)
    ffh = jnp.maximum(ffh * sf1_ref[0][None, :] + bf1_ref[0][None, :], 0.0)
    ff = jnp.dot(ffh.astype(x.dtype), wf2_ref[:].astype(x.dtype),
                 preferred_element_type=f32)
    ff = ff * sf2_ref[0][None, :] + bf2_ref[0][None, :]
    x3 = x2 + ff * rw

    x_out_ref[:] = x3.astype(x_out_ref.dtype)


def fused_layer_step(
    x: jax.Array,                   # [B, D]
    weights: Dict[str, jax.Array],  # packed layer weights (see pack_layer)
    cache_k: jax.Array,             # [B, L, D] (flattened heads)
    cache_v: jax.Array,
    mem_k: jax.Array,               # [B, S, D]
    mem_v: jax.Array,
    mem_bias: jax.Array,            # [B, S] f32
    index: jax.Array,               # [] int32
    n_head: int,
    interpret: bool = False,
    block_b: Optional[int] = None,
    mem_k_scale: Optional[jax.Array] = None,  # [D] f32 (int8 mem_k dequant)
    mem_v_scale: Optional[jax.Array] = None,  # [D] f32 (int8 mem_v dequant)
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One fused decoder layer step. Returns (x_out, attn_mean, new_ck, new_cv).

    The cache buffers are donated/aliased: callers must treat the inputs as
    consumed and use the returned buffers.

    block_b grids the batch so per-block VMEM (weights ~7 MB for a 2x layer +
    B_blk x (L + 2S) x D x 2 bytes of K/V) stays under the ~16 MB budget;
    weight blocks use a constant index_map so they stay resident across
    blocks. Default: whole batch in one block.
    """
    b, d = x.shape
    s = mem_k.shape[1]
    l_buf = cache_k.shape[1]
    f_dim = weights["wf1"].shape[1]
    if mem_k_scale is None:
        mem_k_scale = jnp.ones((d,), jnp.float32)
    if mem_v_scale is None:
        mem_v_scale = jnp.ones((d,), jnp.float32)
    # Per-output-channel weight dequant scales (quantize_packed, w8). All-ones
    # when the packed weights are bf16/f32 — the kernel multiply is then a
    # cheap identity on [B, out] activations.
    ones = lambda n: jnp.ones((1, n), jnp.float32)
    w_scales = [
        weights.get("sqkv", ones(3 * d)).reshape(1, 3 * d),
        weights.get("sso", ones(d)).reshape(1, d),
        weights.get("scq", ones(d)).reshape(1, d),
        weights.get("sco", ones(d)).reshape(1, d),
        weights.get("sf1", ones(f_dim)).reshape(1, f_dim),
        weights.get("sf2", ones(d)).reshape(1, d),
    ]
    if block_b is None or block_b >= b:
        blk, grid = b, 1
    else:
        # Mosaic tiling: a BLOCKED second-minor dim must be a multiple of the
        # 8-sublane tile (the [blk, d]/[blk, s] blocks put the batch there).
        # Interpret mode does not enforce this — the real chip rejected
        # block 4 with "last two dimensions ... divisible by 8 and 128"
        # (PERF_SWEEP 2026-08-18) — so round up rather than crash.
        block_b = max(8, -(-block_b // 8) * 8)
        while b % block_b:
            block_b += 8
        if block_b >= b:
            blk, grid = b, 1
        else:
            blk, grid = block_b, b // block_b
    rw = jnp.stack(
        [weights["resweight"], weights["resweight_src"]]
    ).reshape(1, 2).astype(jnp.float32)

    full = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    batched = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: (i,) + (0,) * (len(shape) - 1),
        memory_space=pltpu.VMEM,
    )
    w_specs = [
        full(weights["wqkv"].shape), full((1, 3 * d)),
        full(weights["wso"].shape), full((1, d)),
        full(weights["wcq"].shape), full((1, d)),
        full(weights["wco"].shape), full((1, d)),
        full(weights["wf1"].shape), full((1, weights["wf1"].shape[1])),
        full(weights["wf2"].shape), full((1, d)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(grid,),
        in_specs=(
            [batched((blk, d))]                               # x
            + w_specs                                          # 12 weights
            + [pl.BlockSpec((1, 2), lambda i, *_: (0, 0),
                            memory_space=pltpu.SMEM)]          # rw
            + [batched((blk, l_buf, d)), batched((blk, l_buf, d))]  # ck cv
            + [batched((blk, s, d)), batched((blk, s, d))]     # memk memv
            + [batched((blk, s))]                              # bias
            + [full((1, d)), full((1, d))]                     # sk sv
            + [full((1, 3 * d)), full((1, d)), full((1, d)),   # weight scales
               full((1, d)), full((1, f_dim)), full((1, d))]
        ),
        out_specs=[
            batched((blk, d)),
            batched((blk, s)),
            batched((blk, l_buf, d)),
            batched((blk, l_buf, d)),
        ],
    )
    out_shape = [
        jax.ShapeDtypeStruct((b, d), x.dtype),
        jax.ShapeDtypeStruct((b, s), jnp.float32),
        jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
        jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype),
    ]
    # input index -> output index, over the FLATTENED inputs INCLUDING the
    # scalar-prefetch operand (jax pallas_call docs: "indices are in the
    # flattened inputs"; the convention is backend-independent — aliases are
    # resolved once at the jaxpr level before lowering, so interpret-mode
    # parity covers the compiled path too).
    # inputs: 0:idx 1:x 2..13:weights 14:rw 15:ck 16:cv 17:memk 18:memv
    #         19:bias 20:sk 21:sv 22..27:weight scales
    x_out, attn, ck, cv = pl.pallas_call(
        functools.partial(_layer_step_kernel, n_head=n_head),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases={15: 2, 16: 3},
        interpret=interpret,
        # The resident working set (one 2x layer's weights ~7 MB + the
        # batch-block's self-cache and cross-K/V blocks + f32 reduce temps)
        # legitimately exceeds Mosaic's 16 MB scoped-VMEM DEFAULT at block 8
        # (17.9 MB measured on silicon 2026-08-18); v5e has 128 MB physical
        # VMEM, so raise the cap rather than shrink the block below the
        # 8-sublane tile floor.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(
        jnp.asarray(index, jnp.int32).reshape(1),
        x,
        weights["wqkv"], weights["bqkv"].reshape(1, -1),
        weights["wso"], weights["bso"].reshape(1, -1),
        weights["wcq"], weights["bcq"].reshape(1, -1),
        weights["wco"], weights["bco"].reshape(1, -1),
        weights["wf1"], weights["bf1"].reshape(1, -1),
        weights["wf2"], weights["bf2"].reshape(1, -1),
        rw,
        cache_k, cache_v,
        mem_k, mem_v,
        mem_bias.astype(jnp.float32),
        jnp.asarray(mem_k_scale, jnp.float32).reshape(1, d),
        jnp.asarray(mem_v_scale, jnp.float32).reshape(1, d),
        *w_scales,
    )
    return x_out, attn, ck, cv


def quantize_mem_kv(
    mem_k: jax.Array, mem_v: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-channel symmetric int8 quantization of the precomputed cross K/V.

    Returns (k_int8, k_scale[D], v_int8, v_scale[D]) for fused_layer_step's
    mem_k/mem_v + mem_k_scale/mem_v_scale. Channel-wise (last-dim) scales
    fold exactly outside both attention reductions — logits fold into q,
    values fold after the prob-weighted sum — so the only numeric deviation
    is the int8 rounding (~1% relative on the K/V entries). Quantization
    runs once per window configuration (the cross K/V precompute), never in
    the per-token loop."""

    def q(x):
        xf = x.astype(jnp.float32)
        s = jnp.max(jnp.abs(xf), axis=tuple(range(x.ndim - 1))) / 127.0
        s = jnp.maximum(s, 1e-8)
        xi = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
        return xi, s

    k8, sk = q(mem_k)
    v8, sv = q(mem_v)
    return k8, sk, v8, sv


_W8_KEYS = (("wqkv", "sqkv"), ("wso", "sso"), ("wcq", "scq"),
            ("wco", "sco"), ("wf1", "sf1"), ("wf2", "sf2"))


def quantize_packed(packed: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8 quantization of one packed layer's
    matmul weights (w8). After kv8 halves the cross-K/V read, the decoder
    weights are the next-largest HBM stream of the decode step (~30 MB/step
    bf16 at 2x bench shapes); int8 storage halves it. Output-channel scales
    fold exactly after each dot, so the only numeric deviation is the int8
    rounding of the weight entries (~0.4% relative).

    Biases and resweights pass through unchanged (they are f32 and tiny).
    Run ONCE per decode (FusedASRDecoder.init_decode_state stores the result
    in the decode state so the quantization never sits inside the token loop).
    """

    def q(w):
        wf = w.astype(jnp.float32)
        s = jnp.max(jnp.abs(wf), axis=0) / 127.0           # [out]
        s = jnp.maximum(s, 1e-8)
        w8 = jnp.clip(jnp.round(wf / s[None, :]), -127, 127).astype(jnp.int8)
        return w8, s

    out = dict(packed)
    for wk, sk_ in _W8_KEYS:
        w8, s = q(packed[wk])
        out[wk] = w8
        out[sk_] = s
    return out


def pack_layer(layer_params: Dict, dtype=jnp.bfloat16) -> Dict[str, jax.Array]:
    """Flax RZDecoderLayer params -> packed kernel weights (kernels [in, out],
    biases f32, resweights f32 scalars)."""
    p = layer_params
    return {
        "wqkv": jnp.asarray(p["self_attn"]["qkv"]["kernel"], dtype),
        "bqkv": jnp.asarray(p["self_attn"]["qkv"]["bias"], jnp.float32),
        "wso": jnp.asarray(p["self_attn"]["out_proj"]["kernel"], dtype),
        "bso": jnp.asarray(p["self_attn"]["out_proj"]["bias"], jnp.float32),
        "wcq": jnp.asarray(p["cross_attn"]["q"]["kernel"], dtype),
        "bcq": jnp.asarray(p["cross_attn"]["q"]["bias"], jnp.float32),
        "wco": jnp.asarray(p["cross_attn"]["out_proj"]["kernel"], dtype),
        "bco": jnp.asarray(p["cross_attn"]["out_proj"]["bias"], jnp.float32),
        "wf1": jnp.asarray(p["linear1"]["kernel"], dtype),
        "bf1": jnp.asarray(p["linear1"]["bias"], jnp.float32),
        "wf2": jnp.asarray(p["linear2"]["kernel"], dtype),
        "bf2": jnp.asarray(p["linear2"]["bias"], jnp.float32),
        "resweight": jnp.asarray(p["resweight"], jnp.float32),
        "resweight_src": jnp.asarray(p["resweight_src"], jnp.float32),
    }


def pack_decoder(decoder_params: Dict, n_layers: int,
                 dtype=jnp.bfloat16) -> Tuple[Dict[str, jax.Array], ...]:
    """Pack all RZDecoder layers (params['decoder']['layers_i'])."""
    return tuple(
        pack_layer(decoder_params[f"layers_{li}"], dtype)
        for li in range(n_layers)
    )

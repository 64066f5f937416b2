"""Pallas TPU kernels for the frontend hot path.

Two kernels, each with an XLA twin elsewhere in ops/ (the twins remain the
default on non-TPU backends; tests run these in interpreter mode):

  * fused_logmel_project — the mel projection + log epsilon of the frontend
    as one kernel: power [B*F, n_freqs] x filterbank [n_freqs, n_mels] on
    the MXU with the log fused in VMEM, tiled over frame blocks. Keeps the
    intermediate mel energies out of HBM entirely (ops/logmel.py materializes
    them between the matmul and the log unless XLA fuses).

  * specaug_mask — SpecAugment with the on-chip PRNG: per-example seeds feed
    pltpu.prng_seed / prng_random_bits, the span masks are computed and
    applied in VMEM, one grid step per batch element. No host-generated mask
    tensors cross HBM (ops/specaug.py samples with jax.random and streams
    [B, T, M] selects).

Tile notes: n_freqs (201) and n_mels (80) are padded to lane multiples of
128 by the wrappers; frame blocks are 128 sublanes.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tal_asrd_tpu.core.utils import round_up


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Fused mel projection + log
# ---------------------------------------------------------------------------

def _logmel_kernel(power_ref, fb_ref, out_ref, *, eps: float):
    acc = jnp.dot(power_ref[:], fb_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.log(acc + eps)


def fused_logmel_project(
    power: jax.Array,      # [N, n_freqs] flattened (batch*frames)
    filterbank: jax.Array,  # [n_freqs, n_mels]
    eps: float = 1e-6,
    block: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """log(power @ fb + eps) as a single tiled Pallas kernel -> [N, n_mels]."""
    interpret = _default_interpret() if interpret is None else interpret
    n, f = power.shape
    f2, m = filterbank.shape
    assert f == f2
    n_pad = round_up(max(n, 1), block)
    f_pad = round_up(f, 128)
    m_pad = round_up(m, 128)
    power_p = jnp.zeros((n_pad, f_pad), jnp.float32).at[:n, :f].set(power)
    fb_p = jnp.zeros((f_pad, m_pad), jnp.float32).at[:f, :m].set(filterbank)

    out = pl.pallas_call(
        functools.partial(_logmel_kernel, eps=eps),
        grid=(n_pad // block,),
        in_specs=[
            pl.BlockSpec((block, f_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, m_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(power_p, fb_p)
    return out[:n, :m]


# ---------------------------------------------------------------------------
# SpecAugment with on-chip PRNG
# ---------------------------------------------------------------------------

def _specaug_kernel(seed_ref, spec_ref, out_ref, *,
                    t: int, m: int, f_param: int, t_param: int,
                    n_freq_masks: int, n_time_masks: int):
    pltpu.prng_seed(seed_ref[pl.program_id(0)])
    block = spec_ref[0]          # [t_pad, m_pad]
    tt, mm = block.shape

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tt, mm), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tt, mm), 0)
    keep = jnp.ones((tt, mm), jnp.bool_)

    def draw_span(param: int, dim: int):
        bits = pltpu.prng_random_bits((3, 128))  # one row of entropy per draw
        width = (bits[0, 0] % jnp.uint32(max(param, 1))).astype(jnp.int32)
        start = (bits[1, 0] % jnp.uint32(dim)).astype(jnp.int32)
        start = jnp.minimum(start, dim - width - 1)
        start = jnp.maximum(start, 0)
        span = jnp.where(
            width > 0,
            (bits[2, 0] % jnp.uint32(jnp.maximum(width, 1))).astype(jnp.int32),
            0,
        )
        return start, start + span

    for _ in range(n_freq_masks):
        s, e = draw_span(f_param, m)
        keep &= ~((col_ids >= s) & (col_ids < e))
    for _ in range(n_time_masks):
        s, e = draw_span(t_param, t)
        keep &= ~((row_ids >= s) & (row_ids < e))
    # padding region is passthrough (kept)
    out_ref[0] = jnp.where(keep, block, 0.0)


def specaug_pallas(
    seeds: jax.Array,   # [B] int32 per-example seeds
    spec: jax.Array,    # [B, T, M] float32
    freq_mask_param: int = 27,
    num_freq_masks: int = 2,
    time_mask_param: int = 100,
    num_time_masks: int = 2,
    interpret: bool | None = None,
) -> jax.Array:
    """SpecAugment via the TPU PRNG; one grid step per batch element."""
    interpret = _default_interpret() if interpret is None else interpret
    b, t, m = spec.shape
    t_pad = round_up(t, 8)
    m_pad = round_up(m, 128)
    spec_p = jnp.zeros((b, t_pad, m_pad), jnp.float32).at[:, :t, :m].set(spec)

    kernel = functools.partial(
        _specaug_kernel, t=t, m=m,
        f_param=freq_mask_param, t_param=time_mask_param,
        n_freq_masks=num_freq_masks, n_time_masks=num_time_masks,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            # full seed vector in SMEM; the kernel indexes by program_id
            pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, t_pad, m_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, m_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, m_pad), jnp.float32),
        interpret=interpret,
    )(seeds.astype(jnp.int32), spec_p)
    return out[:, :t, :m]

"""Vectorized SpecAugment.

The reference applies frequency and time masks with nested Python loops over
the batch (/root/reference/tal/asr/models.py:531-566: freq_mask F=27 x2,
time_mask T=100 x2). Here the same distribution of masks is drawn with JAX PRNG
and applied as a single fused elementwise select — no host loops, fully
batched, differentiable-through (masked positions simply carry zeros).

Sampling semantics mirrored from the reference per (example, mask):
    width  ~ U{0, .., param-1}            (random.randrange(0, param))
    start  ~ U{0, .., dim - width - 1}    (random.randrange(0, dim - width))
    end    ~ U{start, .., start+width-1}  (random.randrange(start, start+width))
    zero out [start, end)
so the expected masked span is ~width/2, exactly as upstream. (The reference
has an early-return quirk when width==0 that skips remaining masks for the
whole batch; we treat width==0 as an empty mask instead — distributionally the
only difference is that later masks are still applied.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import SpecAugmentConfig


def _sample_spans(key, batch, num_masks, param, dim):
    """Returns (start, end) int32 arrays of shape [batch, num_masks]."""
    k1, k2, k3 = jax.random.split(key, 3)
    width = jax.random.randint(k1, (batch, num_masks), 0, param)
    u = jax.random.uniform(k2, (batch, num_masks))
    start = jnp.floor(u * (dim - width)).astype(jnp.int32)
    v = jax.random.uniform(k3, (batch, num_masks))
    span = jnp.floor(v * jnp.maximum(width, 1)).astype(jnp.int32)
    end = start + jnp.where(width > 0, span, 0)
    return start, end


def _span_mask(start, end, dim):
    """[batch, num_masks] spans -> [batch, dim] bool keep-mask (True = keep)."""
    pos = jnp.arange(dim, dtype=jnp.int32)[None, None, :]
    masked = (pos >= start[..., None]) & (pos < end[..., None])
    return ~jnp.any(masked, axis=1)


def spec_augment(
    key: jax.Array,
    spec: jax.Array,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> jax.Array:
    """Apply SpecAugment to [B, T, n_mels] features."""
    b, t, m = spec.shape
    kf, kt = jax.random.split(key)
    f_start, f_end = _sample_spans(kf, b, cfg.num_freq_masks, cfg.freq_mask_param, m)
    t_start, t_end = _sample_spans(kt, b, cfg.num_time_masks, cfg.time_mask_param, t)
    keep_f = _span_mask(f_start, f_end, m)  # [B, n_mels]
    keep_t = _span_mask(t_start, t_end, t)  # [B, T]
    keep = keep_t[:, :, None] & keep_f[:, None, :]
    return jnp.where(keep, spec, jnp.zeros((), dtype=spec.dtype))

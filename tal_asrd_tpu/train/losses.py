"""Loss functions.

Parity targets:
  * LabelSmoothLoss (/root/reference/tal/asr/util.py:19-29): off-target weight
    smoothing/(V-1), on-target 1-smoothing, loss = -(w * log_softmax).sum(-1).
  * masked CE as used in training_step (tal/asr/system.py:553-564): per-position
    CE, masked_select by the text mask, mean.

Deviation (deliberate, documented): the reference's smoothed branch feeds the
scalar LabelSmoothLoss output through masked_select, which broadcasts the
scalar over the mask — i.e. upstream label smoothing silently averages over
padded positions too. We apply the mask to the per-position smoothed loss
before averaging (the obviously-intended semantics); with smoothing=0 the two
paths agree exactly.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def log_softmax_cross_entropy(
    logits: jax.Array,      # [..., V] (any float dtype; softmax in f32)
    targets: jax.Array,     # [...] int
    smoothing: float = 0.0,
) -> jax.Array:
    """Per-position (label-smoothed) cross entropy, float32 output."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if smoothing == 0.0:
        return nll
    v = logits.shape[-1]
    off = smoothing / (v - 1.0)
    # -(w * logp).sum = -[(1-s) * logp_t + off * (sum(logp) - logp_t)]
    total = jnp.sum(logp, axis=-1)
    return (1.0 - smoothing - off) * nll - off * total


def masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of x over positions where mask is True (mask in {0,1}/bool)."""
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)


def masked_token_loss(
    logits: jax.Array,    # [B, L, V]
    targets: jax.Array,   # [B, L]
    mask: jax.Array,      # [B, L] True on real (unpadded) positions
    smoothing: float = 0.0,
) -> jax.Array:
    return masked_mean(log_softmax_cross_entropy(logits, targets, smoothing), mask)


def masked_accuracy(logits: jax.Array, targets: jax.Array, mask: jax.Array) -> jax.Array:
    pred = jnp.argmax(logits, axis=-1)
    return masked_mean((pred == targets).astype(jnp.float32), mask)

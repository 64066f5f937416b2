"""On-device n-gram repetition mask.

The reference's `ngram_repeat_mask` (/root/reference/tal/asr/util.py:5-17)
loops over Python sets per batch element; the unaligned decoder calls it every
generation step (system.py:426-429), forcing a host sync. Here the same
quantity is computed as a static-shape O(L^2) comparison that stays on device
inside the decode while_loop.

Semantics (matching upstream): scanning j = 0..L-n-1, an n-gram starting at j
is "repeated" if an identical n-gram started at any j' < j (n-grams at
positions > L-n-1 are recorded as seen but never flagged, and the first
occurrence is never flagged). Positions [j, j+n) of flagged n-grams get mask 1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_repeat_mask(xs: jax.Array, n: int, valid_len: jax.Array | None = None) -> jax.Array:
    """xs: [B, L] int tokens -> [B, L] int32 mask with 1 on repeated n-grams.

    valid_len: optional [B] effective lengths; positions >= valid_len are
    treated as nonexistent (needed because TPU buffers are fixed-size padded).
    """
    b, l = xs.shape
    if l <= n:
        return jnp.zeros((b, l), dtype=jnp.int32)

    # gram[b, j] == gram[b, j'] iff tokens[j:j+n] == tokens[j':j'+n].
    # Build [B, L-n+1... ] windows by stacked shifts (n is small & static).
    n_starts = l - n + 1
    windows = jnp.stack([xs[:, i : i + n_starts] for i in range(n)], axis=-1)  # [B, S, n]
    eq = jnp.all(windows[:, :, None, :] == windows[:, None, :, :], axis=-1)  # [B, S, S]

    starts = jnp.arange(n_starts)
    earlier = starts[None, :] < starts[:, None]  # [S, S]: j' < j
    if valid_len is not None:
        # Only n-grams fully inside the valid region participate.
        ok = (starts[None, :] + n) <= valid_len[:, None]  # [B, S]
        eq = eq & ok[:, :, None] & ok[:, None, :]
    # Upstream only *flags* starts j <= L - n - 1 (range(len-n)), but records all.
    flaggable = starts <= (l - n - 1)
    repeated = jnp.any(eq & earlier[None], axis=-1) & flaggable[None]  # [B, S]

    # Scatter each repeated start over its n positions.
    pos = jnp.arange(l)
    cover = (pos[None, None, :] >= starts[None, :, None]) & (
        pos[None, None, :] < (starts + n)[None, :, None]
    )  # [1, S, L]
    mask = jnp.any(repeated[:, :, None] & cover, axis=1)
    return mask.astype(jnp.int32)

"""Reference-parity decoding: non-causal full-prefix re-decode per step.

The reference decodes with causal_mask=False (system.py:113-114): every step
re-encodes the WHOLE prefix bidirectionally, so earlier tokens' hidden states
(and hence deep-layer keys/values) change as new tokens arrive — KV caching
is mathematically invalid there. The framework's default decoders
(decode/beam.py, decode/unaligned.py) use causal+cached decoding
(training-matched masking, O(1) per step); this module provides the exact
reference computation for bit-parity studies (DecodeConfig.self_attn_mode
= 'noncausal_ref').

Implementation: a bounded lax.while_loop over a fixed-size token buffer; each
step re-decodes the buffer with causal=False and a target key-padding mask
excluding positions beyond the current length (so padded slots neither attend
nor get attended — equivalent to the reference's exact-length input), then
reads the logits at the last real position. O(L^2) attention per emitted
token, all on device (the reference additionally syncs to host every step).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def greedy_noncausal(
    model,
    variables,
    encoder_out: Dict[str, jax.Array],
    prime: jax.Array,         # [B, P]
    max_len: int,
    eos_id: Optional[int] = None,
):
    """Greedy generation with full non-causal re-decode per step.

    Returns dict(tokens [B, max_len], lengths [B], attn [B, max_len, S]):
    attn[b, t] is the mean-layer cross-attention used to emit token t.
    """
    b, p = prime.shape
    s = encoder_out["encoder_out"].shape[1]
    tokens = jnp.zeros((b, max_len), jnp.int32)
    tokens = tokens.at[:, :p].set(prime)
    positions = jnp.arange(max_len)

    def cond(c):
        step, _, done, _ = c
        return (step < max_len) & ~jnp.all(done)

    def body(c):
        step, tokens, done, attn_buf = c
        pad_mask = positions[None, :] >= step  # [1, L] True = padded slot
        logits, attn = model.apply(
            variables, tokens, encoder_out, False, False,
            jnp.broadcast_to(pad_mask, (b, max_len)),
            method=type(model).decode,
        )
        last = jax.lax.dynamic_index_in_dim(logits, step - 1, axis=1)[:, 0, :]
        nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
        if eos_id is not None:
            nxt = jnp.where(done, eos_id, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
        attn_mean = jnp.mean(attn, axis=0)  # [B, L, S]
        attn_last = jax.lax.dynamic_index_in_dim(attn_mean, step - 1, axis=1)
        attn_buf = jax.lax.dynamic_update_slice(
            attn_buf, attn_last.astype(attn_buf.dtype), (0, step, 0)
        )
        new_done = done | ((nxt == eos_id) if eos_id is not None else False)
        return step + 1, tokens, new_done, attn_buf

    attn_buf = jnp.zeros((b, max_len, s), jnp.float32)
    done0 = jnp.zeros((b,), bool)
    step, tokens, done, attn_buf = jax.lax.while_loop(
        cond, body, (jnp.asarray(p, jnp.int32), tokens, done0, attn_buf)
    )
    if eos_id is not None:
        # length = index of first EOS after the prime, +1; else final step
        after = tokens[:, p:] == eos_id
        has = jnp.any(after, axis=1)
        lengths = jnp.where(has, p + jnp.argmax(after, axis=1) + 1, step)
    else:
        lengths = jnp.full((b,), step)
    return {"tokens": tokens, "lengths": lengths, "attn": attn_buf}

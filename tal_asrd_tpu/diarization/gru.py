"""Multi-layer GRU as lax.scan (cuDNN-GRU replacement for UIS-RNN).

Gate math matches torch.nn.GRU so converted weights are drop-in:
    r = sigmoid(W_ir x + b_ir + W_hr h + b_hr)
    z = sigmoid(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r * (W_hn h + b_hn))
    h' = (1 - z) * n + z * h
(cf. CoreRNN at /root/reference/tal/diarization/uisrnn/uisrnn.py:20-39; the
reference leans on cuDNN + PackedSequence — here variable lengths are masks
and the time loop is a lax.scan that XLA pipelines. Params are explicit so
the scan body is pure jnp; param layout mirrors torch: per layer, input and
hidden projections to the fused [r|z|n] gate block.)
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def gru_cell(x, h, wi_k, wi_b, wh_k, wh_b):
    """One GRU step. x [B, D], h [B, H]; kernels [D,3H]/[H,3H], biases [3H]."""
    gi = x @ wi_k + wi_b
    gh = h @ wh_k + wh_b
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


class GRUCell(nn.Module):
    """Single-step module wrapper (kept for API symmetry)."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jax.Array, h: jax.Array) -> jax.Array:
        d_in = x.shape[-1]
        h_sz = self.hidden_size
        wi_k = self.param("wi_kernel", nn.initializers.lecun_normal(), (d_in, 3 * h_sz))
        wi_b = self.param("wi_bias", nn.initializers.zeros, (3 * h_sz,))
        wh_k = self.param("wh_kernel", nn.initializers.lecun_normal(), (h_sz, 3 * h_sz))
        wh_b = self.param("wh_bias", nn.initializers.zeros, (3 * h_sz,))
        return gru_cell(x, h, wi_k, wi_b, wh_k, wh_b)


class GRU(nn.Module):
    """Stacked GRU over [B, T, D] with optional per-step mask [B, T]
    (masked steps keep the previous hidden state)."""

    hidden_size: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,                      # [B, T, D]
        h0: Optional[jax.Array] = None,    # [depth, B, H]
        mask: Optional[jax.Array] = None,  # [B, T] 1 = real step
    ) -> Tuple[jax.Array, jax.Array]:
        b, t, _ = x.shape
        h_sz = self.hidden_size
        if h0 is None:
            h0 = jnp.zeros((self.depth, b, h_sz), self.dtype)
        ms = (
            jnp.ones((t, b), bool) if mask is None else jnp.swapaxes(mask, 0, 1)
        )

        out = x
        h_finals = []
        for li in range(self.depth):
            d_in = out.shape[-1]
            wi_k = self.param(f"layer_{li}_wi_kernel",
                              nn.initializers.lecun_normal(), (d_in, 3 * h_sz))
            wi_b = self.param(f"layer_{li}_wi_bias", nn.initializers.zeros, (3 * h_sz,))
            wh_k = self.param(f"layer_{li}_wh_kernel",
                              nn.initializers.lecun_normal(), (h_sz, 3 * h_sz))
            wh_b = self.param(f"layer_{li}_wh_bias", nn.initializers.zeros, (3 * h_sz,))

            def step(h, inp, wi_k=wi_k, wi_b=wi_b, wh_k=wh_k, wh_b=wh_b):
                xt, mt = inp
                h_new = gru_cell(xt, h, wi_k, wi_b, wh_k, wh_b)
                h_new = jnp.where(mt[:, None], h_new, h)
                return h_new, h_new

            xs = jnp.swapaxes(out, 0, 1)  # [T, B, D]
            h_last, ys = jax.lax.scan(step, h0[li], (xs, ms))
            out = jnp.swapaxes(ys, 0, 1)
            h_finals.append(h_last)
        return out, jnp.stack(h_finals, axis=0)

"""ReZero transformer decoder with first-class attention-weight outputs and
KV caches.

Re-design of the reference's ModRZTXDecoderLayer + nn.TransformerDecoder
(/root/reference/tal/asr/models.py:119-128,488-528). Differences that are
deliberate TPU-first choices:

  * Cross-attention weights are explicit return values, not attributes
    smuggled out of layers (models.py:519 stores `self.src_attn_weights` on
    the module; the unaligned decoder and speaker-embedding export read them
    back). Here every decode returns (hidden states, per-layer attention
    weights) so the whole computation stays inside one jit.
  * Incremental decoding uses explicit KV caches (the reference re-decodes the
    entire prefix every generated token, system.py:113-114). Cross-attention
    K/V are computed once per encoder window; self-attention K/V accumulate in
    a fixed-size buffer addressed by a step index — static shapes throughout.
  * Attention softmax runs in float32; the rest follows the module dtype
    (bfloat16 in production).

Parity notes: like torch.nn.MultiheadAttention, returned attention weights are
averaged over heads; scaling is 1/sqrt(head_dim); key_padding_mask semantics
(True = ignore). The ReZero residual layout matches upstream: `resweight`
(init 0) gates the self-attention AND feed-forward residuals, `resweight_src`
gates the cross-attention residual (models.py:504-527).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

NEG_INF = -1e9  # additive mask value; softmax runs in f32


def sinusoidal_positions(max_len: int, d_model: int) -> np.ndarray:
    """Sinusoidal table, matches PositionalEncoding (tal/modules.py:24-64)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(0, max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class PositionalEncoding(nn.Module):
    d_model: int
    max_len: int = 512
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, offset: Any = 0) -> jax.Array:
        pe = jnp.asarray(sinusoidal_positions(self.max_len, self.d_model), self.dtype)
        seq_len = x.shape[1]
        if isinstance(offset, int) and offset == 0:
            x = x + pe[None, :seq_len]
        else:
            x = x + jax.lax.dynamic_slice_in_dim(pe, offset, seq_len, axis=0)[None]
        return nn.Dropout(self.dropout, deterministic=not train)(x)


def _attend(
    q: jax.Array,  # [B, Tq, H, Dh]
    k: jax.Array,  # [B, Tk, H, Dh]
    v: jax.Array,  # [B, Tk, H, Dh]
    bias: Optional[jax.Array],  # additive [B or 1, 1 or H, Tq, Tk] in f32
    dropout: float,
    train: bool,
    dropout_rng=None,
    dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Scaled dot-product attention. Returns (out [B,Tq,H,Dh], mean-head
    weights [B,Tq,Tk] in float32)."""
    dh = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)
    if bias is not None:
        logits = logits + bias
    weights = jax.nn.softmax(logits, axis=-1)  # f32
    mean_weights = jnp.mean(weights, axis=1)  # [B, Tq, Tk], torch-MHA-style
    if train and dropout > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout), 0.0)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(dtype), v, preferred_element_type=jnp.float32
    ).astype(dtype)
    return out, mean_weights


class SelfAttention(nn.Module):
    """Fused-QKV self-attention with an optional fixed-size KV cache."""

    d_model: int
    n_head: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.qkv = nn.Dense(3 * self.d_model, dtype=self.dtype)
        self.out_proj = nn.Dense(self.d_model, dtype=self.dtype)

    def __call__(
        self,
        x: jax.Array,  # [B, T, D]
        *,
        causal: bool = True,
        train: bool = False,
        cache: Optional[Dict[str, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
        key_padding_mask: Optional[jax.Array] = None,  # [B, T] True = ignore
    ):
        b, t, _ = x.shape
        h, dh = self.n_head, self.d_model // self.n_head
        q, k, v = jnp.split(self.qkv(x), 3, axis=-1)
        q = q.reshape(b, t, h, dh)
        k = k.reshape(b, t, h, dh)
        v = v.reshape(b, t, h, dh)
        rng = self.make_rng("dropout") if train and self.dropout > 0 else None

        new_cache = None
        if cache is not None:
            # Incremental decode: write k/v at cache_index, attend to
            # positions <= cache_index + t - 1 of the fixed-size buffer.
            ck = jax.lax.dynamic_update_slice_in_dim(cache["k"], k, cache_index, axis=1)
            cv = jax.lax.dynamic_update_slice_in_dim(cache["v"], v, cache_index, axis=1)
            new_cache = {"k": ck, "v": cv}
            l_max = ck.shape[1]
            pos = jnp.arange(l_max)
            qpos = cache_index + jnp.arange(t)
            bias = jnp.where(
                pos[None, None, None, :] <= qpos[None, None, :, None], 0.0, NEG_INF
            )
            out, w = _attend(q, ck, cv, bias, self.dropout, train, rng, self.dtype)
        else:
            bias = None
            if causal:
                i = jnp.arange(t)
                bias = jnp.where(
                    i[None, None, :, None] >= i[None, None, None, :], 0.0, NEG_INF
                )
            if key_padding_mask is not None:
                kp = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0)
                bias = kp if bias is None else bias + kp
            out, w = _attend(q, k, v, bias, self.dropout, train, rng, self.dtype)

        out = out.reshape(b, t, self.d_model)
        return self.out_proj(out), w, new_cache


class CrossAttention(nn.Module):
    """Encoder-decoder attention; memory K/V precomputable once per window."""

    d_model: int
    n_head: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.q = nn.Dense(self.d_model, dtype=self.dtype)
        self.kv = nn.Dense(2 * self.d_model, dtype=self.dtype)
        self.out_proj = nn.Dense(self.d_model, dtype=self.dtype)

    def precompute_kv(self, memory: jax.Array) -> Dict[str, jax.Array]:
        b, s, _ = memory.shape
        h, dh = self.n_head, self.d_model // self.n_head
        k, v = jnp.split(self.kv(memory), 2, axis=-1)
        return {"k": k.reshape(b, s, h, dh), "v": v.reshape(b, s, h, dh)}

    def __call__(
        self,
        x: jax.Array,                        # [B, T, D]
        memory: Optional[jax.Array] = None,  # [B, S, D] (or None with mem_kv)
        *,
        key_padding_mask: Optional[jax.Array] = None,  # [B, S] True = ignore
        train: bool = False,
        mem_kv: Optional[Dict[str, jax.Array]] = None,
    ):
        b, t, _ = x.shape
        h, dh = self.n_head, self.d_model // self.n_head
        q = self.q(x).reshape(b, t, h, dh)
        if mem_kv is None:
            mem_kv = self.precompute_kv(memory)
        bias = None
        if key_padding_mask is not None:
            bias = jnp.where(key_padding_mask[:, None, None, :], NEG_INF, 0.0)
        rng = self.make_rng("dropout") if train and self.dropout > 0 else None
        out, w = _attend(q, mem_kv["k"], mem_kv["v"], bias, self.dropout, train, rng, self.dtype)
        out = out.reshape(b, t, self.d_model)
        return self.out_proj(out), w


class RZDecoderLayer(nn.Module):
    """ReZero decoder layer (ModRZTXDecoderLayer parity, models.py:488-528)."""

    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = SelfAttention(self.d_model, self.n_head, self.dropout, self.dtype)
        self.cross_attn = CrossAttention(self.d_model, self.n_head, self.dropout, self.dtype)
        self.linear1 = nn.Dense(self.dim_feedforward, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.resweight = self.param("resweight", nn.initializers.zeros, (), jnp.float32)
        self.resweight_src = self.param("resweight_src", nn.initializers.zeros, (), jnp.float32)
        self.drop = nn.Dropout(self.dropout)

    def __call__(
        self,
        tgt: jax.Array,
        memory: Optional[jax.Array] = None,
        *,
        causal: bool = True,
        memory_key_padding_mask: Optional[jax.Array] = None,
        train: bool = False,
        self_cache: Optional[Dict[str, jax.Array]] = None,
        cache_index: Optional[jax.Array] = None,
        mem_kv: Optional[Dict[str, jax.Array]] = None,
        tgt_key_padding_mask: Optional[jax.Array] = None,
    ):
        rw = self.resweight.astype(self.dtype)
        rw_src = self.resweight_src.astype(self.dtype)
        det = not train

        sa, _, new_cache = self.self_attn(
            tgt, causal=causal, train=train, cache=self_cache,
            cache_index=cache_index, key_padding_mask=tgt_key_padding_mask,
        )
        tgt = tgt + self.drop(sa, deterministic=det) * rw

        ca, src_attn_weights = self.cross_attn(
            tgt,
            memory,
            key_padding_mask=memory_key_padding_mask,
            train=train,
            mem_kv=mem_kv,
        )
        tgt = tgt + self.drop(ca, deterministic=det) * rw_src

        ff = nn.relu(self.linear1(tgt))
        ff = self.drop(ff, deterministic=det)
        ff = self.linear2(ff)
        tgt = tgt + self.drop(ff, deterministic=det) * rw
        return tgt, src_attn_weights, new_cache

    def precompute_mem_kv(self, memory: jax.Array) -> Dict[str, jax.Array]:
        return self.cross_attn.precompute_kv(memory)


class RZDecoder(nn.Module):
    """Stack of RZDecoderLayers. Returns hidden states and stacked per-layer
    cross-attention weights [n_layers, B, Tq, S] (float32)."""

    n_layers: int
    d_model: int
    n_head: int
    dim_feedforward: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.layers = [
            RZDecoderLayer(
                self.d_model,
                self.n_head,
                self.dim_feedforward,
                self.dropout,
                self.dtype,
                name=f"layers_{li}",
            )
            for li in range(self.n_layers)
        ]

    def __call__(
        self,
        tgt: jax.Array,
        memory: Optional[jax.Array] = None,
        *,
        causal: bool = True,
        memory_key_padding_mask: Optional[jax.Array] = None,
        train: bool = False,
        caches: Optional[Tuple[Dict[str, jax.Array], ...]] = None,
        cache_index: Optional[jax.Array] = None,
        mem_kvs: Optional[Tuple[Dict[str, jax.Array], ...]] = None,
        tgt_key_padding_mask: Optional[jax.Array] = None,
    ):
        attn_all = []
        new_caches = []
        for li, layer in enumerate(self.layers):
            tgt, attn_w, nc = layer(
                tgt,
                memory,
                causal=causal,
                memory_key_padding_mask=memory_key_padding_mask,
                train=train,
                self_cache=None if caches is None else caches[li],
                cache_index=cache_index,
                mem_kv=None if mem_kvs is None else mem_kvs[li],
                tgt_key_padding_mask=tgt_key_padding_mask,
            )
            attn_all.append(attn_w)
            new_caches.append(nc)
        attn = jnp.stack(attn_all, axis=0)
        return tgt, attn, (tuple(new_caches) if caches is not None else None)

    def precompute_mem_kvs(self, memory: jax.Array):
        """Per-layer cross-attention K/V for `memory` (one-time per window)."""
        return tuple(layer.precompute_mem_kv(memory) for layer in self.layers)

    def init_cache(self, batch: int, max_len: int, dtype=None):
        dtype = dtype or self.dtype
        dh = self.d_model // self.n_head
        return tuple(
            {
                "k": jnp.zeros((batch, max_len, self.n_head, dh), dtype),
                "v": jnp.zeros((batch, max_len, self.n_head, dh), dtype),
            }
            for _ in range(self.n_layers)
        )

"""Decoder-only transformer language model for shallow fusion.

The reference *uses* `wildspeech.lm.model.DecoderLMModel` for LM shallow
fusion during decoding (/root/reference/tal/asr/test.py:47-55 instantiates
vocab=10000, hidden=512, heads=4, layers=6, max_len=512; fusion applied at
tal/asr/system.py:127-138) but the class was trimmed from the release. This
module provides it first-class: a ReZero decoder-only LM sharing this
framework's attention/FFN blocks, with tied input/output embeddings.

During fusion the LM never sees speaker tokens: callers clamp ids with
min(id, vocab-1) exactly as system.py:129-130 does (see decode/beam.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from tal_asrd_tpu.core.config import LMConfig
from tal_asrd_tpu.models.asr import _embed_init
from tal_asrd_tpu.models.decoder import PositionalEncoding, SelfAttention


class RZLMLayer(nn.Module):
    """ReZero pre-activation LM block: self-attention + FFN, both gated by a
    single zero-init residual weight."""

    d_model: int
    n_head: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.self_attn = SelfAttention(self.d_model, self.n_head, self.dropout, self.dtype)
        self.linear1 = nn.Dense(4 * self.d_model, dtype=self.dtype)
        self.linear2 = nn.Dense(self.d_model, dtype=self.dtype)
        self.resweight = self.param("resweight", nn.initializers.zeros, (), jnp.float32)
        self.drop = nn.Dropout(self.dropout)

    def __call__(self, x, *, causal=True, train=False, cache=None, cache_index=None):
        rw = self.resweight.astype(self.dtype)
        det = not train
        sa, _, new_cache = self.self_attn(
            x, causal=causal, train=train, cache=cache, cache_index=cache_index
        )
        x = x + self.drop(sa, deterministic=det) * rw
        ff = self.linear2(self.drop(nn.relu(self.linear1(x)), deterministic=det))
        x = x + self.drop(ff, deterministic=det) * rw
        return x, new_cache


class DecoderLMModel(nn.Module):
    cfg: LMConfig = LMConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.embedding = nn.Embed(
            c.vocab_size, c.hidden_size, embedding_init=_embed_init(c.hidden_size),
            dtype=self.dtype,
        )
        self.pos = PositionalEncoding(c.hidden_size, c.max_positions, c.dropout, self.dtype)
        self.blocks = [
            RZLMLayer(c.hidden_size, c.n_head, c.dropout, self.dtype, name=f"layers_{i}")
            for i in range(c.n_layers)
        ]

    def __call__(self, tokens: jax.Array, causal: bool = True, train: bool = False):
        """tokens [B, L] -> logits [B, L, vocab]."""
        x = self.embedding(tokens)
        x = self.pos(x, train=train)
        for blk in self.blocks:
            x, _ = blk(x, causal=causal, train=train)
        return self.embedding.attend(x)

    # Incremental decoding -------------------------------------------------
    def init_cache(self, batch: int, max_len: int):
        dh = self.cfg.hidden_size // self.cfg.n_head
        return tuple(
            {
                "k": jnp.zeros((batch, max_len, self.cfg.n_head, dh), self.dtype),
                "v": jnp.zeros((batch, max_len, self.cfg.n_head, dh), self.dtype),
            }
            for _ in range(self.cfg.n_layers)
        )

    def decode_step(self, y_tok: jax.Array, caches, index):
        """[B, 1] token -> ([B, vocab] logits, new caches)."""
        x = self.embedding(y_tok)
        x = self.pos(x, train=False, offset=index)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, nc = blk(x, train=False, cache=cache, cache_index=index)
            new_caches.append(nc)
        return self.embedding.attend(x)[:, -1], tuple(new_caches)

    def decode_prefill(self, tokens: jax.Array, cache_len: int):
        """Causal full decode of a history buffer [B, P] that also fills the
        self-attention KV caches (positions restart at 0 for the slice — the
        LM sees the same re-sliced history window as the ASR decoder during
        unaligned fusion, tal/asr/system.py:368-377).

        Returns (logits [B, P, vocab], caches filled at positions [0, P))."""
        b, p = tokens.shape
        caches = self.init_cache(b, cache_len)
        x = self.embedding(tokens)
        x = self.pos(x, train=False)
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            x, nc = blk(x, train=False, cache=cache,
                        cache_index=jnp.zeros((), jnp.int32))
            new_caches.append(nc)
        return self.embedding.attend(x), tuple(new_caches)

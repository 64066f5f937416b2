"""Contrastive speaker-embedding metric head.

Parity target: /root/reference/tal/asr/train_embed.py:21-137 — a 3-layer MLP
(64 -> 256 -> 256 -> 10) trained contrastively on exported speaker
embeddings: each batch row is [anchor, positive, negatives...]; normalized
outputs, cosine logits of anchor vs supports, cross-entropy with the positive
at index 0. The ContrastiveDataset/Collator the reference imports were
trimmed from its release (SURVEY §0); both are provided here first-class.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn


class EmbedMLP(nn.Module):
    hidden: int = 256
    out_dim: int = 10

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out_dim)(x)


def contrastive_loss(model, params, batch):
    """batch: [B, n_way, D]; index 0 anchor, 1 positive, rest negatives
    (train_embed.py:46-66 semantics: supports = rows 1.., positive first)."""
    feats = model.apply({"params": params}, batch)
    feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-8)
    anchor = feats[:, :1]                      # [B, 1, F]
    support = feats[:, 1:]                     # [B, n-1, F]
    logits = jnp.einsum("bif,bjf->bj", anchor, support)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    loss = -jnp.mean(logprobs[:, 0])
    acc = jnp.mean((jnp.argmax(logits, axis=-1) == 0).astype(jnp.float32))
    return loss, acc


class ContrastiveDataset:
    """n-way episodes from (embeddings, speaker_ids): [anchor, positive from
    the same speaker, n-2 negatives from other speakers]."""

    def __init__(self, embeddings: np.ndarray, speaker_ids: np.ndarray,
                 n_way: int = 6, seed: int = 0, epoch_len: int = 5000):
        self.emb = np.asarray(embeddings, np.float32)
        self.ids = np.asarray(speaker_ids)
        self.n_way = n_way
        self.rng = np.random.RandomState(seed)
        self.epoch_len = epoch_len
        self.by_speaker = {}
        for i, s in enumerate(self.ids):
            self.by_speaker.setdefault(int(s), []).append(i)
        # speakers with >= 2 samples can anchor
        self.anchors = [s for s, idx in self.by_speaker.items() if len(idx) >= 2]
        assert self.anchors, "need at least one speaker with 2+ embeddings"

    def __len__(self):
        return self.epoch_len

    def __getitem__(self, i: int) -> np.ndarray:
        spk = self.anchors[self.rng.randint(len(self.anchors))]
        a, p = self.rng.choice(self.by_speaker[spk], 2, replace=False)
        negatives = []
        others = [s for s in self.by_speaker if s != spk]
        while len(negatives) < self.n_way - 2 and others:
            s = others[self.rng.randint(len(others))]
            negatives.append(self.rng.choice(self.by_speaker[s]))
        rows = [a, p] + negatives
        return self.emb[rows]


class ContrastiveCollator:
    def __call__(self, samples):
        return np.stack(samples, axis=0)


class EmbedSystem:
    """Trainer for the metric head (Adam + sqrt-batch LR, train_embed.py:97-105)."""

    def __init__(self, in_dim: int = 64, hidden: int = 256, out_dim: int = 10,
                 lr: float = 1e-4, batch_size: int = 64, seed: int = 0):
        self.model = EmbedMLP(hidden, out_dim)
        self.params = self.model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, 2, in_dim))
        )["params"]
        scaled_lr = lr * np.sqrt(batch_size)
        self.tx = optax.adam(scaled_lr)
        self.opt_state = self.tx.init(self.params)

        model = self.model
        tx = self.tx

        @jax.jit
        def train_step(params, opt_state, batch):
            (loss, acc), grads = jax.value_and_grad(
                lambda p: contrastive_loss(model, p, batch), has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss, acc

        @jax.jit
        def eval_step(params, batch):
            return contrastive_loss(model, params, batch)

        self._train_step = train_step
        self._eval_step = eval_step

    def fit(self, batches: Iterator[np.ndarray], steps: Optional[int] = None):
        losses, accs = [], []
        for i, batch in enumerate(batches):
            self.params, self.opt_state, loss, acc = self._train_step(
                self.params, self.opt_state, jnp.asarray(batch)
            )
            losses.append(float(loss))
            accs.append(float(acc))
            if steps is not None and i + 1 >= steps:
                break
        return losses, accs

    def evaluate(self, batches: Iterator[np.ndarray]) -> Tuple[float, float]:
        losses, accs = [], []
        for batch in batches:
            loss, acc = self._eval_step(self.params, jnp.asarray(batch))
            losses.append(float(loss))
            accs.append(float(acc))
        return float(np.mean(losses)), float(np.mean(accs))

    def embed(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(self.model.apply({"params": self.params}, jnp.asarray(x)))

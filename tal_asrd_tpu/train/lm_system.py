"""Decoder-LM training system (shallow-fusion LM).

The reference trains `DecoderLMModel` with a trimmed-from-release script (its
argparse survives at tal/asr/args.py:65-107: hidden 768 default, 4 heads,
max_len 512, epoch_len 5000, Adam-style training with the usual sqrt-batch LR
scaling). This provides the full capability: a text dataset built from
transcripts, a jitted CE train step, and perplexity eval.
"""
from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tal_asrd_tpu.core.config import LMConfig
from tal_asrd_tpu.models.lm import DecoderLMModel
from tal_asrd_tpu.train.losses import masked_token_loss
from tal_asrd_tpu.train.system import TrainState


class LMTextDataset:
    """Token stream -> fixed-length training rows <EOS> t1 .. tN."""

    def __init__(self, texts: Sequence[str], tokenizer, max_len: int = 512):
        stream: List[int] = []
        for t in texts:
            stream.extend(tokenizer.encode(t, bos_token=False, eos_token=True))
        self.rows = [
            stream[i : i + max_len]
            for i in range(0, max(len(stream) - max_len, 1), max_len)
        ]
        if not self.rows:
            self.rows = [stream[:max_len]]
        self.max_len = max_len
        self.pad = tokenizer.pad_token_id

    def __len__(self):
        return len(self.rows)

    def __getitem__(self, i):
        row = self.rows[i]
        out = np.full(self.max_len, self.pad, np.int32)
        out[: len(row)] = row
        mask = np.zeros(self.max_len, bool)
        mask[: len(row)] = True
        return out, mask


class LMSystem:
    def __init__(self, cfg: LMConfig, lr: float = 1e-4, batch_size: int = 64,
                 dtype=jnp.float32, seed: int = 0):
        self.cfg = cfg
        self.model = DecoderLMModel(cfg, dtype=dtype)
        scaled_lr = lr * np.sqrt(batch_size)
        self.tx = optax.adam(scaled_lr)
        toks = jnp.zeros((1, 8), jnp.int32)
        params = self.model.init(jax.random.PRNGKey(seed), toks)["params"]
        self.state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                opt_state=self.tx.init(params))

        model, tx = self.model, self.tx

        def loss_fn(params, tokens, mask):
            logits = model.apply({"params": params}, tokens[:, :-1])
            return masked_token_loss(logits, tokens[:, 1:], mask[:, 1:])

        @jax.jit
        def train_step(state, tokens, mask):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, tokens, mask)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=params,
                              opt_state=opt_state), loss

        self._train_step = train_step
        self._eval_loss = jax.jit(loss_fn)

    def fit(self, batches: Iterator, steps: Optional[int] = None) -> List[float]:
        losses = []
        for i, (tokens, mask) in enumerate(batches):
            self.state, loss = self._train_step(
                self.state, jnp.asarray(tokens), jnp.asarray(mask)
            )
            losses.append(float(loss))
            if steps is not None and i + 1 >= steps:
                break
        return losses

    def perplexity(self, batches: Iterator) -> float:
        losses = [
            float(self._eval_loss(self.state.params, jnp.asarray(t), jnp.asarray(m)))
            for t, m in batches
        ]
        return float(np.exp(np.mean(losses)))

    def variables(self):
        return {"params": self.state.params}


def batch_iterator(dataset: LMTextDataset, batch_size: int, seed: int = 0,
                   epochs: int = 1):
    rng = np.random.RandomState(seed)
    for _ in range(epochs):
        order = rng.permutation(len(dataset))
        for i in range(0, len(order) - batch_size + 1, batch_size):
            rows = [dataset[j] for j in order[i : i + batch_size]]
            toks = np.stack([r[0] for r in rows])
            masks = np.stack([r[1] for r in rows])
            yield toks, masks

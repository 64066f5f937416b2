"""Separate-diarization baseline training system.

Parity target: /root/reference/tal/baseline/speaker_system.py:25-189 — train
SDModel as a frame-level speaker classifier: each sample is one utterance
with a single gold speaker id broadcast over the encoder frames; CE + frame
accuracy on unpadded frames; LAMB with the same sqrt-batch LR scaling and
linear decay as the ASR system.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tal_asrd_tpu.core.config import FrontendConfig, SDModelConfig, SpecAugmentConfig, TrainConfig
from tal_asrd_tpu.models.sd import SDModel
from tal_asrd_tpu.train.losses import masked_accuracy, masked_token_loss
from tal_asrd_tpu.train.optimizers import lamb
from tal_asrd_tpu.train.schedules import constant_schedule, linear_decay_schedule
from tal_asrd_tpu.train.system import TrainState


class SDSystem:
    def __init__(self, model_cfg: SDModelConfig,
                 train_cfg: TrainConfig = TrainConfig(),
                 frontend_cfg: FrontendConfig = FrontendConfig(),
                 specaug_cfg: SpecAugmentConfig = SpecAugmentConfig(),
                 dtype=jnp.bfloat16):
        self.cfg = model_cfg
        self.train_cfg = train_cfg
        self.model = SDModel(model_cfg, frontend_cfg, specaug_cfg, dtype=dtype)
        scaled = train_cfg.scaled_lr
        if scaled is None:
            schedule = constant_schedule(1e-3)
        elif train_cfg.max_steps is not None:
            schedule = linear_decay_schedule(scaled, train_cfg.max_steps)
        else:
            schedule = constant_schedule(scaled)
        self.tx = lamb(schedule)

    def init_state(self, rng, example_batch) -> TrainState:
        params = self.model.init(
            {"params": rng}, example_batch["audio"],
            example_batch["audio_lens"], train=False,
        )["params"]
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=self.tx.init(params))

    def loss_fn(self, params, batch, rng, train: bool):
        rngs = {}
        if train:
            r1, r2 = jax.random.split(rng)
            rngs = {"dropout": r1, "specaug": r2}
        logits, enc = self.model.apply(
            {"params": params}, batch["audio"], batch["audio_lens"],
            train=train, rngs=rngs,
        )
        # broadcast the utterance speaker over frames (speaker_system.py)
        b, s, _ = logits.shape
        target = jnp.broadcast_to(batch["speaker"][:, None], (b, s))
        mask = ~enc["encoder_padding_mask"]
        loss = masked_token_loss(logits, target, mask)
        acc = masked_accuracy(logits, target, mask)
        return loss, {"loss": loss, "spk_acc": acc}

    def make_train_step(self):
        def step(state: TrainState, batch, rng):
            (loss, metrics), grads = jax.value_and_grad(
                lambda p: self.loss_fn(p, batch, rng, True), has_aux=True
            )(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(step=state.step + 1, params=params,
                              opt_state=opt_state), metrics

        return jax.jit(step, donate_argnums=(0,))

    def make_eval_step(self):
        return jax.jit(lambda state, batch:
                       self.loss_fn(state.params, batch, None, False)[1])

    def frame_features(self, params, audio, audio_lens):
        """Frame-level 128-d speaker embeddings + argmax ids (for the
        reconciliation pipeline)."""
        enc = self.model.apply({"params": params}, jnp.asarray(audio),
                               jnp.asarray(audio_lens), False,
                               method=SDModel.encode)
        emb = self.model.apply({"params": params}, enc, False,
                               method=SDModel.embed)
        logits = self.model.apply({"params": params}, enc, False,
                                  method=SDModel.decode)
        return (np.asarray(emb), np.asarray(jnp.argmax(logits, -1)),
                np.asarray(enc["encoder_padding_mask"]))

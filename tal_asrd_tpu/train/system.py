"""ASR training system: loss, train/eval steps, optimizer wiring.

TPU-native redesign of the reference LightningModule System
(/root/reference/tal/asr/system.py:26-870). The Lightning trainer loop,
DDP backend and apex AMP are replaced by:

  * a pure `loss_fn` implementing training_step semantics (system.py:529-571):
    unknown-speaker clamping via min() (:533-537), 1% random token replacement
    (:542-547), label-smoothed CE on text + spk_weight-weighted CE from the
    speaker head (:553-564);
  * a jitted `train_step` with gradient accumulation as a lax.scan over
    micro-batches (replacing Lightning accumulate_grad_batches) and bf16
    compute (replacing apex O1);
  * sharding annotations over a ('data','model') mesh instead of
    DDP/DistributedSampler — XLA emits the gradient all-reduce;
  * LAMB with sqrt-batch-scaled LR + linear decay (system.py:764-781).

Batches are dicts of fixed-shape arrays:
  audio [B, T] f32, audio_lens [B] i32, text [B, L] i32,
  text_mask [B, L] bool, spk_ids [B, L] i32
matching the reference collater output (tal/asr/data/aligned.py:246-270).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from tal_asrd_tpu.core.config import (
    DecodeConfig,
    FrontendConfig,
    ModelConfig,
    SpecAugmentConfig,
    TrainConfig,
)
from tal_asrd_tpu.models.asr import ASRModel
from tal_asrd_tpu.parallel.mesh import (
    batch_sharding,
    opt_state_shardings,
    param_shardings,
    replicated_sharding,
)
from tal_asrd_tpu.train.losses import masked_token_loss
from tal_asrd_tpu.train.optimizers import lamb
from tal_asrd_tpu.train.schedules import constant_schedule, linear_decay_schedule


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any


class ASRSystem:
    """Owns the model + optimizer and builds jitted steps."""

    def __init__(
        self,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig = TrainConfig(),
        frontend_cfg: FrontendConfig = FrontendConfig(),
        specaug_cfg: SpecAugmentConfig = SpecAugmentConfig(),
        dtype=jnp.bfloat16,
    ):
        self.cfg = model_cfg
        self.train_cfg = train_cfg
        self.model = ASRModel(model_cfg, frontend_cfg, specaug_cfg, dtype=dtype)
        self.tx = self._make_optimizer()

    # ------------------------------------------------------------------
    def _make_optimizer(self) -> optax.GradientTransformation:
        tc = self.train_cfg
        scaled_lr = tc.scaled_lr
        if scaled_lr is None:
            schedule = constant_schedule(1e-3)
        elif tc.max_steps is not None:
            schedule = linear_decay_schedule(scaled_lr, tc.max_steps)
        else:
            schedule = constant_schedule(scaled_lr)
        return lamb(schedule)

    # ------------------------------------------------------------------
    def init_state(self, rng: jax.Array, example_batch: Dict[str, jax.Array]) -> TrainState:
        params = self.model.init(
            {"params": rng},
            example_batch["audio"],
            example_batch["text"][:, :-1],
            example_batch["audio_lens"],
            train=False,
        )["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.tx.init(params),
        )

    # ------------------------------------------------------------------
    def loss_fn(
        self,
        params,
        batch: Dict[str, jax.Array],
        rng: Optional[jax.Array],
        train: bool,
        smoothing: Optional[float] = None,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        """training_step parity (system.py:529-571). Validation/test use
        smoothing=0 regardless of config (system.py:553)."""
        cfg, tc = self.cfg, self.train_cfg
        y = batch["text"]
        spk_ids = batch["spk_ids"]

        if cfg.num_speakers > 0 and tc.spk_weight == 0:
            # Clamp unknown-speaker tokens to the last speaker id (:533-537)
            y = jnp.minimum(y, cfg.vocab_size + cfg.num_speakers - 1)
        y_prev, y_target = y[:, :-1], y[:, 1:]

        rngs = {}
        if train:
            r_rep, r_drop, r_spec = jax.random.split(rng, 3)
            rngs = {"dropout": r_drop, "specaug": r_spec}
            if tc.token_replace_prob > 0:
                # TDS-paper 1% random input replacement (:542-547); replacement
                # ids are drawn from the text vocab only (high=len(tokenizer)).
                r_a, r_b = jax.random.split(r_rep)
                rep_mask = jax.random.uniform(r_a, y_prev.shape) < tc.token_replace_prob
                rand_tok = jax.random.randint(r_b, y_prev.shape, 0, cfg.vocab_size)
                y_prev = jnp.where(rep_mask, rand_tok, y_prev)

        (lm_logits, spk_logits), _ = self.model.apply(
            {"params": params},
            batch["audio"],
            y_prev,
            batch["audio_lens"],
            train=train,
            rngs=rngs,
        )

        smooth = (tc.smoothing if train else 0.0) if smoothing is None else smoothing
        mask = batch["text_mask"][:, 1:]
        lm_loss = masked_token_loss(lm_logits, y_target, mask, smooth)

        spk_loss = jnp.zeros((), jnp.float32)
        if tc.spk_weight > 0:
            spk_loss = masked_token_loss(spk_logits, spk_ids[:, 1:], mask, smooth)

        loss = lm_loss + tc.spk_weight * spk_loss
        return loss, {"loss": loss, "lm_loss": lm_loss, "spk_loss": spk_loss}

    # ------------------------------------------------------------------
    def _train_step(self, state: TrainState, batch, rng):
        """One optimizer step, with micro-batch gradient accumulation when
        grad_acc > 1 (batch leading dim reshaped to [acc, micro, ...])."""
        acc = self.train_cfg.grad_acc
        grad_fn = jax.grad(lambda p, b, r: self.loss_fn(p, b, r, True), has_aux=True)

        if acc <= 1:
            grads, metrics = grad_fn(state.params, batch, rng)
        else:
            def micro(carry, inp):
                g_sum, m_sum = carry
                b, r = inp
                g, m = grad_fn(state.params, b, r)
                g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
                m_sum = jax.tree_util.tree_map(jnp.add, m_sum, m)
                return (g_sum, m_sum), None

            micro_batches = jax.tree_util.tree_map(
                lambda x: x.reshape((acc, x.shape[0] // acc) + x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, acc)
            g_zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            m_zeros = {k: jnp.zeros((), jnp.float32)
                       for k in ("loss", "lm_loss", "spk_loss")}
            (g_sum, m_sum), _ = jax.lax.scan(
                micro, (g_zeros, m_zeros), (micro_batches, rngs)
            )
            grads = jax.tree_util.tree_map(lambda g: g / acc, g_sum)
            metrics = jax.tree_util.tree_map(lambda m: m / acc, m_sum)

        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params, opt_state=new_opt)
        metrics = dict(metrics, grad_norm=optax.global_norm(grads))
        return new_state, metrics

    def _eval_step(self, state: TrainState, batch):
        _, metrics = self.loss_fn(state.params, batch, None, False)
        return metrics

    # ------------------------------------------------------------------
    def make_train_step(self, mesh=None, donate: bool = True):
        """Jitted train step. With a mesh, the batch rides the 'data' axis and
        params follow the TP sharding rules — XLA inserts all collectives."""
        if mesh is None:
            return jax.jit(self._train_step, donate_argnums=(0,) if donate else ())

        def step(state, batch, rng):
            batch = jax.lax.with_sharding_constraint(
                batch,
                jax.tree_util.tree_map(
                    lambda x: batch_sharding(mesh, x.ndim), batch
                ),
            )
            return self._train_step(state, batch, rng)

        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self, mesh=None):
        return jax.jit(self._eval_step)

    # ------------------------------------------------------------------
    def make_generation_spotcheck(self, tokenizer, batch: Dict[str, Any],
                                  max_len: Optional[int] = None):
        """Validation-time generation spot check (system.py:578-623 parity):
        greedily decode the first sample of `batch`, print GOLD vs GENERATED,
        and log through the metrics logger. Returns a Trainer generation_hook.
        """
        from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search

        model = self.model
        cfg = self.cfg
        one = jax.tree_util.tree_map(lambda x: x[:1], batch)
        tgt_len = int(batch["text"].shape[1])
        spec = BeamSearchSpec(
            beam_size=1,
            max_new_tokens=max_len or int(tgt_len * 1.5),
            eos_id=tokenizer.eos_token_id,
            vocab_size=cfg.num_tokens,
            text_vocab_size=len(tokenizer),
            force_output=True,
        )

        @jax.jit
        def gen(variables, audio, lens, prime):
            enc = model.apply(variables, audio, lens, False,
                              method=type(model).encode)
            return beam_search(model, variables, enc, prime, spec)

        def hook(state, step, logger):
            import numpy as np

            out = gen({"params": state.params},
                      jnp.asarray(one["audio"]), jnp.asarray(one["audio_lens"]),
                      jnp.asarray(one["text"][:, :1]))
            n = int(np.asarray(out["lengths"])[0])
            hyp_ids = [int(t) for t in np.asarray(out["tokens"])[0, :n]
                       if t < len(tokenizer)]
            tgt_n = int(np.asarray(one["text_mask"][0]).sum())
            ref_ids = [int(t) for t in np.asarray(one["text"])[0, : tgt_n - 1]
                       if t < len(tokenizer)]
            logger.log_generation(
                np.asarray(one["audio"][0]),
                tokenizer.decode(ref_ids),
                tokenizer.decode(hyp_ids),
                step=step,
            )

        return hook

    # ------------------------------------------------------------------
    def shard_state(self, mesh, state: TrainState) -> TrainState:
        """Place a host TrainState onto the mesh: params follow the TP rules
        (replicated over 'data'); optimizer moments (LAMB mu/nu) follow the
        SAME shardings as their params — replicating them would waste HBM
        proportional to the TP degree and force a reshard every step."""
        p_sh = param_shardings(mesh, state.params)
        params = jax.tree_util.tree_map(jax.device_put, state.params, p_sh)
        o_sh = opt_state_shardings(mesh, state.opt_state, state.params, p_sh)
        opt_state = jax.tree_util.tree_map(jax.device_put, state.opt_state, o_sh)
        return TrainState(
            step=jax.device_put(state.step, replicated_sharding(mesh)),
            params=params,
            opt_state=opt_state,
        )

    def state_shardings(self, mesh, state: TrainState) -> TrainState:
        """Sharding pytree matching `state` (for jit out_shardings / asserts)."""
        p_sh = param_shardings(mesh, state.params)
        o_sh = opt_state_shardings(mesh, state.opt_state, state.params, p_sh)
        return TrainState(step=replicated_sharding(mesh), params=p_sh, opt_state=o_sh)

"""Optimizers.

The reference hand-rolls four optimizers (/root/reference/tal/optimizers.py):
RAdam (:9-82), Adafactor (:84-232), a Lookahead wrapper (:234-299) and LAMB
(:302-400) — LAMB being the one actually used for training
(tal/asr/system.py:771). Here they are optax GradientTransformations:

  * `lamb` is a from-scratch implementation matching the reference's exact
    update rule (v3 paper semantics): NO bias correction, eps added after the
    sqrt, weight-norm clamped to [0, 10], trust ratio forced to 1 when either
    norm is zero, decoupled-from-nothing weight decay added into the Adam step
    before the trust ratio.
  * `radam`, `adafactor`, `lookahead` re-export optax's implementations (same
    algorithms the reference ported from fairseq/cybertronai).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable[[jax.Array], jax.Array]]


class LambState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def lamb(
    learning_rate: ScalarOrSchedule,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.0,
    always_adam: bool = False,
    clamp_weight_norm: float = 10.0,
) -> optax.GradientTransformation:
    """LAMB with the reference's exact semantics (tal/optimizers.py:337-399).

    update = -lr * trust_ratio * adam_step, where
      m <- b1*m + (1-b1)*g ;  v <- b2*v + (1-b2)*g^2   (no debiasing)
      adam_step = m / (sqrt(v) + eps) + weight_decay * p
      trust_ratio = clamp(||p||, 0, 10) / ||adam_step||  (1 if either is 0)
    `always_adam` mirrors the `adam=True` comparison switch.
    """

    def init_fn(params):
        return LambState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        assert params is not None, "lamb requires params"
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates
        )
        count = state.count + 1
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        def per_param(p, m, v):
            adam_step = m / (jnp.sqrt(v) + eps)
            if weight_decay != 0.0:
                adam_step = adam_step + weight_decay * p
            if always_adam:
                trust = 1.0
            else:
                w_norm = jnp.clip(jnp.sqrt(jnp.sum(p.astype(jnp.float32) ** 2)),
                                  0.0, clamp_weight_norm)
                a_norm = jnp.sqrt(jnp.sum(adam_step.astype(jnp.float32) ** 2))
                trust = jnp.where(
                    (w_norm == 0.0) | (a_norm == 0.0), 1.0, w_norm / a_norm
                )
            return (-lr * trust * adam_step).astype(p.dtype)

        new_updates = jax.tree_util.tree_map(per_param, params, mu, nu)
        return new_updates, LambState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def radam(learning_rate: ScalarOrSchedule, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam (rectified Adam), algorithmic parity with tal/optimizers.py:9-82."""
    return optax.radam(learning_rate, b1=b1, b2=b2, eps=eps)


def adafactor(learning_rate: Optional[ScalarOrSchedule] = None,
              weight_decay: Optional[float] = None) -> optax.GradientTransformation:
    """Adafactor (fairseq-style factored second moment), tal/optimizers.py:84-232."""
    return optax.adafactor(learning_rate=learning_rate,
                           weight_decay_rate=weight_decay)


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead wrapper (k steps fast weights, then slow interpolation),
    tal/optimizers.py:234-299. Use with optax.lookahead param handling."""
    return optax.lookahead(inner, sync_period=sync_period,
                           slow_step_size=slow_step_size)

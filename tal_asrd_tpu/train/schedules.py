"""Learning-rate schedules.

Parity targets:
  * triangle_schedule / inv_sqrt_schedule (/root/reference/tal/schedules.py:3-14)
  * the linear-decay LambdaLR built inline at tal/asr/system.py:776-779:
      factor(step) = max(1 - step/total_steps, scaled_lr / 1000)
    (the floor is expressed as a *factor* equal to scaled_lr/1000 — an upstream
    quirk we reproduce).
All schedules return functions step -> lr multiplier-applied learning rate.
"""
from __future__ import annotations

import jax.numpy as jnp


def triangle_schedule(max_lr: float, warmup_steps: int, total_steps: int):
    """Linear warmup to max_lr then linear decay to 0 (tal/schedules.py:3-8)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = max_lr * step / jnp.maximum(warmup_steps, 1)
        decay = max_lr * jnp.maximum(
            (total_steps - step) / jnp.maximum(total_steps - warmup_steps, 1), 0.0
        )
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def inv_sqrt_schedule(max_lr: float, warmup_steps: int):
    """T5-style inverse-sqrt decay after warmup (tal/schedules.py:10-14)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = max_lr * step / jnp.maximum(warmup_steps, 1)
        decay = max_lr * jnp.sqrt(warmup_steps / jnp.maximum(step, 1.0))
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def linear_decay_schedule(scaled_lr: float, total_steps: int):
    """The reference's training schedule (system.py:776-779)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        factor = jnp.maximum(1.0 - step / total_steps, scaled_lr / 1000.0)
        return scaled_lr * factor

    return schedule


def constant_schedule(lr: float):
    def schedule(step):
        return jnp.full((), lr, jnp.float32)

    return schedule

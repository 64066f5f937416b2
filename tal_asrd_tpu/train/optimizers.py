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
  * `radam`, `adafactor`, `lookahead` are likewise exact-rule ports of the
    reference's (nonstandard) update rules — RAdam's unrectified branch with
    raw debiased momentum, fairseq Adafactor's relative-step/param-scale/
    RMS-clip ordering, Lookahead's first-step sync — which all differ from
    the optax implementations in ways that change trajectories.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple, Union

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


class RAdamState(NamedTuple):
    count: jax.Array
    mu: optax.Updates
    nu: optax.Updates


def radam(learning_rate: ScalarOrSchedule, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """RAdam with the reference's exact rule (tal/optimizers.py:9-82, the
    Liu et al. 2019 reference implementation):

      m <- b1 m + (1-b1) g ; v <- b2 v + (1-b2) g² ; t 1-based
      N_max = 2/(1-b2) - 1 ; N = N_max - 2 t b2^t / (1-b2^t)
      weight decay (if any): p -= wd * lr * p, applied BEFORE the step
      N >= 5: p -= lr * sqrt((1-b2^t)(N-4)/(N_max-4) * (N-2)/N * N_max/(N_max-2))
                   / (1-b1^t) * m / (sqrt(v) + eps)
      N <  5: p -= lr / (1-b1^t) * m            (no second-moment division)

    This differs from optax.radam in the unrectified branch (the reference
    uses raw m with only b1 debiasing, no eps) and in decay placement."""

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        assert params is not None, "radam requires params (weight decay rule)"
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, updates)
        t = (state.count + 1).astype(jnp.float32)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate

        b2_t = b2 ** t
        n_max = 2.0 / (1.0 - b2) - 1.0
        n_sma = n_max - 2.0 * t * b2_t / (1.0 - b2_t)
        rect = jnp.sqrt(
            (1.0 - b2_t) * (n_sma - 4.0) / (n_max - 4.0)
            * (n_sma - 2.0) / n_sma * n_max / (n_max - 2.0)
        )
        bias1 = 1.0 - b1 ** t
        step_rect = lr * rect / bias1
        step_plain = lr / bias1
        use_rect = n_sma >= 5.0

        def per_param(p, m, v):
            delta = jnp.where(
                use_rect,
                -step_rect * m / (jnp.sqrt(v) + eps),
                -step_plain * m,
            )
            if weight_decay != 0.0:
                delta = delta - weight_decay * lr * p
            return delta.astype(p.dtype)

        new_updates = jax.tree_util.tree_map(per_param, params, mu, nu)
        return new_updates, RAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class AdafactorState(NamedTuple):
    count: jax.Array
    moments: Any  # per-leaf dict: factored {vr, vc} or full {v}; optional m


def adafactor(
    learning_rate: Optional[ScalarOrSchedule] = None,
    eps: Tuple[float, float] = (1e-30, 1e-3),
    clip_threshold: float = 1.0,
    decay_rate: float = -0.8,
    beta1: Optional[float] = None,
    weight_decay: float = 0.0,
    scale_parameter: bool = True,
    relative_step: bool = True,
    warmup_init: bool = False,
) -> optax.GradientTransformation:
    """Adafactor with the reference's (fairseq) exact rules
    (tal/optimizers.py:84-232), which differ from optax.adafactor:

      * relative step size  min(1e-2 | 1e-6 t, 1/sqrt(t)),  scaled by
        max(eps2, RMS(p)) when scale_parameter;
      * beta2_t = 1 - t^decay_rate; factored second moment for ndim >= 2
        (row = mean over last dim, col = mean over -2 dim), approximated as
        rsqrt(row/mean(row)) ⊗ rsqrt(col);
      * update clipped by RMS(update)/clip_threshold, THEN scaled by lr;
      * optional first moment smooths the post-scale update;
      * weight decay applied as p -= wd * lr * p.
    """

    def _leaf_init(p):
        st = {}
        if beta1 is not None:
            st["m"] = jnp.zeros_like(p)
        if p.ndim >= 2:
            st["vr"] = jnp.zeros(p.shape[:-1], jnp.float32)
            st["vc"] = jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32)
        else:
            st["v"] = jnp.zeros_like(p)
        return st

    def init_fn(params):
        return AdafactorState(
            count=jnp.zeros((), jnp.int32),
            moments=jax.tree_util.tree_map(_leaf_init, params),
        )

    def _rms(x):
        return jnp.sqrt(jnp.mean(x.astype(jnp.float32) ** 2))

    def update_fn(updates, state, params=None):
        assert params is not None, "adafactor requires params"
        t = (state.count + 1).astype(jnp.float32)
        beta2t = 1.0 - t ** decay_rate

        if relative_step:
            min_step = 1e-6 * t if warmup_init else 1e-2
            rel_step = jnp.minimum(min_step, 1.0 / jnp.sqrt(t))
        else:
            rel_step = (learning_rate(state.count) if callable(learning_rate)
                        else learning_rate)

        def per_param(p, g, st):
            g = g.astype(jnp.float32)
            p32 = p.astype(jnp.float32)
            lr = rel_step
            if scale_parameter:
                lr = jnp.maximum(eps[1], _rms(p32)) * rel_step
            sq = g * g + eps[0]
            new_st = dict(st)
            if p.ndim >= 2:
                vr = beta2t * st["vr"] + (1.0 - beta2t) * sq.mean(axis=-1)
                vc = beta2t * st["vc"] + (1.0 - beta2t) * sq.mean(axis=-2)
                new_st["vr"], new_st["vc"] = vr, vc
                r = jax.lax.rsqrt(vr / vr.mean(axis=-1, keepdims=True))[..., None]
                c = jax.lax.rsqrt(vc)[..., None, :]
                upd = r * c * g
            else:
                v = beta2t * st["v"] + (1.0 - beta2t) * sq
                new_st["v"] = v
                upd = jax.lax.rsqrt(v) * g
            upd = upd / jnp.maximum(1.0, _rms(upd) / clip_threshold)
            upd = upd * lr
            if beta1 is not None:
                upd = beta1 * st["m"] + (1.0 - beta1) * upd
                new_st["m"] = upd
            delta = -upd
            if weight_decay != 0.0:
                delta = delta - weight_decay * lr * p32
            return delta.astype(p.dtype), new_st

        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_g = treedef.flatten_up_to(updates)
        flat_s = treedef.flatten_up_to(state.moments)
        outs = [per_param(p, g, s) for p, g, s in zip(flat_p, flat_g, flat_s)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [o[0] for o in outs])
        new_moments = jax.tree_util.tree_unflatten(treedef, [o[1] for o in outs])
        return new_updates, AdafactorState(count=state.count + 1,
                                           moments=new_moments)

    return optax.GradientTransformation(init_fn, update_fn)


class LookaheadState(NamedTuple):
    inner: Any
    slow: optax.Params
    counter: jax.Array


def lookahead(inner: optax.GradientTransformation, k: int = 5,
              alpha: float = 0.5) -> optax.GradientTransformation:
    """Lookahead with the reference's exact sync schedule
    (tal/optimizers.py:234-299): after each inner step,
    if counter == 0: slow += alpha (fast - slow); fast = slow;
    counter = (counter + 1) % k — i.e. syncs fire on steps 1, k+1, 2k+1, …
    (the reference syncs immediately after the FIRST step, unlike
    optax.lookahead's every-k schedule)."""

    def init_fn(params):
        return LookaheadState(
            inner=inner.init(params),
            slow=jax.tree_util.tree_map(jnp.array, params),
            counter=jnp.zeros((), jnp.int32),
        )

    def update_fn(updates, state, params=None):
        assert params is not None, "lookahead requires params"
        d, new_inner = inner.update(updates, state.inner, params)
        fast = jax.tree_util.tree_map(jnp.add, params, d)
        sync = state.counter == 0

        def leaf(slow, f, p):
            new_slow = jnp.where(sync, slow + alpha * (f - slow), slow)
            out = jnp.where(sync, new_slow, f)
            return out - p, new_slow

        flat_slow, treedef = jax.tree_util.tree_flatten(state.slow)
        flat_fast = treedef.flatten_up_to(fast)
        flat_p = treedef.flatten_up_to(params)
        pairs = [leaf(s, f, p) for s, f, p in zip(flat_slow, flat_fast, flat_p)]
        new_updates = jax.tree_util.tree_unflatten(treedef, [a for a, _ in pairs])
        new_slow = jax.tree_util.tree_unflatten(treedef, [b for _, b in pairs])
        counter = jnp.where(state.counter + 1 >= k, 0, state.counter + 1)
        return new_updates, LookaheadState(inner=new_inner, slow=new_slow,
                                           counter=counter)

    return optax.GradientTransformation(init_fn, update_fn)

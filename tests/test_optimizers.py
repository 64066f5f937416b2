"""Exact-rule parity for the reference's four optimizers
(tal/optimizers.py:9-400) against independent numpy mirrors of the published
rules (RAdam: Liu et al. 2019 reference impl; Adafactor: fairseq;
Lookahead: Zhang et al. 2019 with the reference's first-step sync quirk)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tal_asrd_tpu.train.optimizers import adafactor, lamb, lookahead, radam


def _run(tx, params, grads_seq):
    state = tx.init(params)
    traj = []
    for g in grads_seq:
        upd, state = tx.update(g, state, params)
        params = optax.apply_updates(params, upd)
        traj.append(jax.tree_util.tree_map(np.asarray, params))
    return traj


def _rand_tree(rng, scale=1.0):
    return {
        "w": jnp.asarray(rng.randn(4, 3).astype(np.float32) * scale),
        "b": jnp.asarray(rng.randn(3).astype(np.float32) * scale),
    }


# ---------------------------------------------------------------------------
# RAdam
# ---------------------------------------------------------------------------
def _radam_numpy(params, grads_seq, lr=1e-2, b1=0.9, b2=0.999, eps=1e-8,
                 wd=0.0):
    p = {k: np.array(v, np.float64) for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in p.items()}
    v = {k: np.zeros_like(vv) for k, vv in p.items()}
    traj = []
    for t, g in enumerate(grads_seq, start=1):
        for k in p:
            gk = np.asarray(g[k], np.float64)
            m[k] = b1 * m[k] + (1 - b1) * gk
            v[k] = b2 * v[k] + (1 - b2) * gk * gk
            b2t = b2 ** t
            n_max = 2 / (1 - b2) - 1
            n_sma = n_max - 2 * t * b2t / (1 - b2t)
            if wd:
                p[k] = p[k] - wd * lr * p[k]
            if n_sma >= 5:
                step = lr * np.sqrt(
                    (1 - b2t) * (n_sma - 4) / (n_max - 4)
                    * (n_sma - 2) / n_sma * n_max / (n_max - 2)
                ) / (1 - b1 ** t)
                p[k] = p[k] - step * m[k] / (np.sqrt(v[k]) + eps)
            else:
                p[k] = p[k] - lr / (1 - b1 ** t) * m[k]
        traj.append({k: v.copy() for k, v in p.items()})
    return traj


@pytest.mark.parametrize("wd", [0.0, 0.01])
def test_radam_matches_reference_rule(wd):
    rng = np.random.RandomState(0)
    params = _rand_tree(rng)
    # enough steps to cross the N_sma >= 5 rectification boundary
    grads = [_rand_tree(np.random.RandomState(100 + i), 0.5) for i in range(8)]
    ours = _run(radam(1e-2, weight_decay=wd), params, grads)
    ref = _radam_numpy(params, grads, wd=wd)
    for o, r in zip(ours, ref):
        for k in r:
            np.testing.assert_allclose(o[k], r[k], rtol=1e-5, atol=1e-6)


def test_radam_unrectified_branch_uses_raw_momentum():
    """Early steps (N_sma < 5) must NOT divide by sqrt(v): with beta1=0 the
    first update is exactly -lr * g (the reference's plain-SGD-with-momentum
    branch), regardless of gradient magnitude."""
    params = {"w": jnp.ones((2,), jnp.float32)}
    g = {"w": jnp.asarray([100.0, 0.01], jnp.float32)}
    tx = radam(1e-3, b1=0.0)
    upd, _ = tx.update(g, tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(upd["w"]), -1e-3 * np.asarray(g["w"]), rtol=1e-6
    )


# ---------------------------------------------------------------------------
# Adafactor (fairseq rules)
# ---------------------------------------------------------------------------
def _adafactor_numpy(params, grads_seq, eps=(1e-30, 1e-3), clip=1.0,
                     decay=-0.8, beta1=None, wd=0.0):
    p = {k: np.array(v, np.float64) for k, v in params.items()}
    st = {}
    for k, v in p.items():
        st[k] = {}
        if beta1 is not None:
            st[k]["m"] = np.zeros_like(v)
        if v.ndim >= 2:
            st[k]["vr"] = np.zeros(v.shape[:-1])
            st[k]["vc"] = np.zeros(v.shape[:-2] + v.shape[-1:])
        else:
            st[k]["v"] = np.zeros_like(v)
    rms = lambda x: np.sqrt(np.mean(x * x))
    traj = []
    for t, g in enumerate(grads_seq, start=1):
        beta2t = 1.0 - t ** decay
        for k in p:
            gk = np.asarray(g[k], np.float64)
            lr = min(1e-2, 1.0 / np.sqrt(t))
            lr = max(eps[1], rms(p[k])) * lr
            sq = gk * gk + eps[0]
            if gk.ndim >= 2:
                st[k]["vr"] = beta2t * st[k]["vr"] + (1 - beta2t) * sq.mean(-1)
                st[k]["vc"] = beta2t * st[k]["vc"] + (1 - beta2t) * sq.mean(-2)
                r = 1 / np.sqrt(st[k]["vr"] / st[k]["vr"].mean(-1, keepdims=True))
                c = 1 / np.sqrt(st[k]["vc"])
                upd = r[..., None] * c[..., None, :] * gk
            else:
                st[k]["v"] = beta2t * st[k]["v"] + (1 - beta2t) * sq
                upd = gk / np.sqrt(st[k]["v"])
            upd = upd / max(1.0, rms(upd) / clip)
            upd = upd * lr
            if beta1 is not None:
                upd = beta1 * st[k]["m"] + (1 - beta1) * upd
                st[k]["m"] = upd
            if wd:
                p[k] = p[k] - wd * lr * p[k]
            p[k] = p[k] - upd
        traj.append({k: v.copy() for k, v in p.items()})
    return traj


@pytest.mark.parametrize("beta1,wd", [(None, 0.0), (0.9, 0.0), (None, 0.01)])
def test_adafactor_matches_fairseq_rule(beta1, wd):
    rng = np.random.RandomState(1)
    params = _rand_tree(rng)
    grads = [_rand_tree(np.random.RandomState(200 + i), 0.5) for i in range(5)]
    ours = _run(adafactor(beta1=beta1, weight_decay=wd), params, grads)
    ref = _adafactor_numpy(params, grads, beta1=beta1, wd=wd)
    for o, r in zip(ours, ref):
        for k in r:
            np.testing.assert_allclose(o[k], r[k], rtol=1e-4, atol=1e-6)


def test_adafactor_factored_memory():
    """ndim>=2 params keep rank-1 second-moment state (row+col, not full)."""
    tx = adafactor()
    params = {"w": jnp.zeros((6, 4))}
    st = tx.init(params)
    assert st.moments["w"]["vr"].shape == (6,)
    assert st.moments["w"]["vc"].shape == (4,)
    assert "v" not in st.moments["w"]


# ---------------------------------------------------------------------------
# Lookahead
# ---------------------------------------------------------------------------
def test_lookahead_first_step_sync_quirk():
    """The reference syncs after steps 1, k+1, 2k+1, ... (counter==0 check
    BEFORE increment, tal/optimizers.py:260-267) — unlike the usual
    every-k-steps schedule. With alpha=0.5 and constant inner delta d:
    step1: fast=p0+d, slow=p0+0.5d -> p=p0+0.5d; steps 2..k: plain fast."""
    k, alpha, d = 4, 0.5, 0.1
    sgd = optax.sgd(learning_rate=1.0)  # update = -g
    tx = lookahead(sgd, k=k, alpha=alpha)
    p = {"w": jnp.zeros((1,), jnp.float32)}
    g = {"w": jnp.full((1,), -d, jnp.float32)}  # inner delta = +d
    st = tx.init(p)
    vals = []
    for _ in range(k + 2):
        upd, st = tx.update(g, st, p)
        p = optax.apply_updates(p, upd)
        vals.append(float(p["w"][0]))
    # step 1: sync -> 0.5*d
    np.testing.assert_allclose(vals[0], alpha * d, rtol=1e-6)
    # steps 2..k: fast-only accumulation
    np.testing.assert_allclose(vals[1], alpha * d + d, rtol=1e-6)
    np.testing.assert_allclose(vals[k - 1], alpha * d + (k - 1) * d, rtol=1e-5)
    # step k+1: sync again: slow=0.5d -> slow + 0.5*(fast+d - slow)
    fast_before = alpha * d + k * d
    expect = alpha * d + alpha * (fast_before - alpha * d)
    np.testing.assert_allclose(vals[k], expect, rtol=1e-5)


def test_lamb_still_matches_reference_rule():
    """Regression guard: LAMB trust ratio clamps ||p|| to [0,10] and forces 1
    on zero norms (tal/optimizers.py:337-399)."""
    params = {"w": jnp.zeros((3,), jnp.float32)}  # zero norm -> trust 1
    g = {"w": jnp.asarray([1.0, 1.0, 1.0], jnp.float32)}
    tx = lamb(1e-2)
    upd, _ = tx.update(g, tx.init(params), params)
    # trust=1, m=0.1*g, v=0.001*g^2, step = lr * m/(sqrt(v)+eps)
    expect = -1e-2 * 0.1 / (np.sqrt(0.001) + 1e-6)
    np.testing.assert_allclose(np.asarray(upd["w"]), expect, rtol=1e-4)

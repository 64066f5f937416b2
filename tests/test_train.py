"""Training-system tests: LAMB parity vs the reference update rule (checked
against a direct numpy re-derivation), label smoothing math, loss masking,
overfit sanity (the reference's --overfit-pct analog, SURVEY §4), and
data/tensor-parallel training on the virtual 8-device CPU mesh.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import (
    FrontendConfig,
    ModelConfig,
    SpecAugmentConfig,
    TrainConfig,
)
from tal_asrd_tpu.parallel.mesh import make_mesh, shard_batch
from tal_asrd_tpu.train import (
    ASRSystem,
    lamb,
    linear_decay_schedule,
    log_softmax_cross_entropy,
    masked_token_loss,
)

TINY = ModelConfig(
    model_type="1x",
    num_speakers=4,
    n_mels=8,
    vocab_size=32,
    n_head=2,
    max_positions=64,
    dropout=0.0,
    embed_size=16,
    tds_depths=(1, 1, 1),
    tds_kernel=5,
)
TINY_FRONTEND = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


def tiny_batch(b=4, t=3200, l=12, vocab=32, n_spk=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "audio": jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1),
        "audio_lens": jnp.full((b,), t, jnp.int32),
        "text": jnp.asarray(rng.randint(0, vocab + n_spk, (b, l)), jnp.int32),
        "text_mask": jnp.ones((b, l), bool),
        "spk_ids": jnp.asarray(rng.randint(0, n_spk, (b, l)), jnp.int32),
    }


# ---------------------------------------------------------------------------
# Optimizer
# ---------------------------------------------------------------------------

def _reference_lamb_step(p, g, m, v, lr, b1=0.9, b2=0.999, eps=1e-6):
    """Direct numpy transcription of the reference update rule
    (tal/optimizers.py:337-399) for cross-checking."""
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    adam_step = m / (np.sqrt(v) + eps)
    w_norm = min(np.sqrt((p**2).sum()), 10.0)
    a_norm = np.sqrt((adam_step**2).sum())
    trust = 1.0 if (w_norm == 0 or a_norm == 0) else w_norm / a_norm
    return p - lr * trust * adam_step, m, v


def test_lamb_matches_reference_rule():
    rng = np.random.RandomState(0)
    p0 = rng.randn(5, 3).astype(np.float32)
    tx = lamb(0.1)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)

    p_ref, m_ref, v_ref = p0.copy(), np.zeros_like(p0), np.zeros_like(p0)
    for step in range(3):
        g = rng.randn(5, 3).astype(np.float32)
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        p_ref, m_ref, v_ref = _reference_lamb_step(p_ref, g, m_ref, v_ref, 0.1)
        np.testing.assert_allclose(np.asarray(params["w"]), p_ref, rtol=2e-5, atol=1e-6)


def test_lamb_zero_weight_trust_ratio_one():
    tx = lamb(0.5)
    params = {"w": jnp.zeros((3,))}
    state = tx.init(params)
    g = jnp.ones((3,))
    updates, _ = tx.update({"w": g}, state, params)
    # m=0.1g, v=0.001g^2 -> adam_step = 0.1/(sqrt(0.001)+eps) ~ 3.1575;
    # weight norm 0 -> trust 1 -> update = -0.5 * adam_step
    expected = -0.5 * (0.1 / (np.sqrt(0.001) + 1e-6))
    np.testing.assert_allclose(np.asarray(updates["w"]), expected, rtol=1e-5)


def test_linear_decay_schedule_floor():
    sched = linear_decay_schedule(scaled_lr=0.8, total_steps=100)
    np.testing.assert_allclose(float(sched(0)), 0.8, rtol=1e-6)
    np.testing.assert_allclose(float(sched(50)), 0.4, rtol=1e-6)
    # Past total_steps the factor floors at scaled_lr/1000 (system.py:778 quirk)
    np.testing.assert_allclose(float(sched(1000)), 0.8 * 0.8 / 1000, rtol=1e-6)


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def test_label_smoothing_matches_manual():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 3, 5), jnp.float32)
    targets = jnp.asarray([[0, 1, 2], [3, 4, 0]], jnp.int32)
    s = 0.1
    got = np.asarray(log_softmax_cross_entropy(logits, targets, s))

    logp = np.asarray(jax.nn.log_softmax(logits, -1))
    v = 5
    w = np.full_like(logp, s / (v - 1))
    for b in range(2):
        for t in range(3):
            w[b, t, targets[b, t]] = 1 - s
    expected = -(w * logp).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_masked_token_loss_ignores_padding():
    logits = jnp.zeros((1, 4, 6))
    targets = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    mask_all = jnp.ones((1, 4), bool)
    mask_half = jnp.asarray([[True, True, False, False]])
    # Uniform logits: loss = log(6) everywhere, so masking changes nothing...
    np.testing.assert_allclose(
        float(masked_token_loss(logits, targets, mask_all)), np.log(6), rtol=1e-6
    )
    # ...but with a peaked distribution on position 3 it must
    logits = logits.at[0, 3, 4].set(10.0)
    full = float(masked_token_loss(logits, targets, mask_all))
    half = float(masked_token_loss(logits, targets, mask_half))
    assert abs(half - np.log(6)) < 1e-5
    assert full < half


# ---------------------------------------------------------------------------
# Train steps
# ---------------------------------------------------------------------------

def make_system(**overrides):
    tc = TrainConfig(batch_size=4, lr=1e-3, max_steps=50, smoothing=0.0, **overrides)
    return ASRSystem(TINY, tc, TINY_FRONTEND, dtype=jnp.float32)


@pytest.mark.slow
def test_train_step_reduces_loss_overfit():
    """--overfit-pct analog: a few LAMB steps on one tiny batch must cut the
    loss (the reference's 'can it memorize' sanity check, SURVEY §4)."""
    sys_ = make_system()
    batch = tiny_batch()
    rng = jax.random.PRNGKey(0)
    state = sys_.init_state(rng, batch)
    step = sys_.make_train_step()
    losses = []
    for i in range(8):
        state, metrics = step(state, batch, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


@pytest.mark.slow
def test_grad_accumulation_matches_full_batch():
    """acc=2 over a batch must equal acc=1 on the same data (with train-mode
    RNG effects disabled via dropout=0 and no token replacement).

    Note: the frontend's whole-batch mean subtraction (models.py:52 parity)
    couples examples across the batch, so exact equivalence requires
    mean_subtract=False here — the same batch-statistics caveat applies to the
    reference under DDP vs single-GPU."""
    fe = FrontendConfig(**{**TINY_FRONTEND.__dict__, "mean_subtract": False})
    no_aug = SpecAugmentConfig(num_freq_masks=0, num_time_masks=0)
    # The sqrt-batch LR scaling includes grad_acc (system.py:767-769 parity),
    # so equalize the *scaled* LR to isolate the accumulation math.
    tc1 = TrainConfig(batch_size=4, lr=1e-3, max_steps=50, grad_acc=1,
                      token_replace_prob=0.0)
    tc2 = TrainConfig(batch_size=4, lr=1e-3 / np.sqrt(2.0), max_steps=50,
                      grad_acc=2, token_replace_prob=0.0)
    assert abs(tc1.scaled_lr - tc2.scaled_lr) < 1e-9
    sys1 = ASRSystem(TINY, tc1, fe, no_aug, dtype=jnp.float32)
    sys2 = ASRSystem(TINY, tc2, fe, no_aug, dtype=jnp.float32)
    batch = tiny_batch(b=4)
    rng = jax.random.PRNGKey(0)
    s1 = sys1.init_state(rng, batch)
    s2 = sys2.init_state(rng, batch)  # identical init (same rng)

    st1, m1 = sys1.make_train_step()(s1, batch, rng)
    st2, m2 = sys2.make_train_step()(s2, batch, rng)
    # Gradients averaged over micro-batches == full-batch gradients here
    # (loss is a masked mean over equal-sized micro batches).
    flat1 = jax.tree_util.tree_leaves(st1.params)
    flat2 = jax.tree_util.tree_leaves(st2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_speaker_head_training():
    tc = TrainConfig(batch_size=4, lr=1e-3, spk_weight=0.5, max_steps=20)
    cfg = ModelConfig(**{**TINY.__dict__, "use_speaker_head": True})
    sys_ = ASRSystem(cfg, tc, TINY_FRONTEND, dtype=jnp.float32)
    batch = tiny_batch(vocab=32, n_spk=4)
    # With a speaker head, text ids stay within the text vocab
    batch["text"] = jnp.minimum(batch["text"], 31)
    rng = jax.random.PRNGKey(0)
    state = sys_.init_state(rng, batch)
    state, metrics = sys_.make_train_step()(state, batch, rng)
    assert float(metrics["spk_loss"]) > 0.0
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_unknown_speaker_clamp():
    """Speaker-token ids beyond vocab+num_speakers-1 must be clamped in the
    loss path (system.py:533-537) and not index out of bounds."""
    sys_ = make_system()
    batch = tiny_batch()
    batch["text"] = batch["text"].at[0, 3].set(32 + 4 + 7)  # unknown speaker id
    rng = jax.random.PRNGKey(0)
    state = sys_.init_state(rng, batch)
    _, metrics = sys_.make_train_step()(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.parametrize("mesh_shape", [(8, 1), (4, 2)])
@pytest.mark.slow
def test_train_step_on_mesh(mesh_shape):
    """DP and DP x TP training on the virtual 8-device CPU mesh."""
    data, model = mesh_shape
    mesh = make_mesh(data=data, model=model)
    sys_ = make_system()
    batch = tiny_batch(b=8)
    rng = jax.random.PRNGKey(0)
    state = sys_.init_state(rng, batch)
    state = sys_.shard_state(mesh, state)
    sharded_batch = shard_batch(mesh, batch)
    step = sys_.make_train_step(mesh)
    state, metrics = step(state, sharded_batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    # And the result must match the single-device step (same math).
    ref_state = sys_.init_state(jax.random.PRNGKey(0), batch)
    _, ref_metrics = sys_.make_train_step()(ref_state, batch, rng)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )

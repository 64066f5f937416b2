"""Full-state checkpoint/resume tests: optimizer moments and step survive a
restart bit-for-bit (the reference resumes only Lightning params), and the
device prefetcher preserves order."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.checkpoint import CheckpointManager
from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig, SpecAugmentConfig, TrainConfig
from tal_asrd_tpu.data.loader import DevicePrefetcher
from tal_asrd_tpu.train import ASRSystem

TINY = ModelConfig(
    model_type="1x", num_speakers=4, n_mels=8, vocab_size=32, n_head=2,
    max_positions=64, dropout=0.0, embed_size=16, tds_depths=(1, 1, 1),
    tds_kernel=5,
)
FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32,
                    mean_subtract=False)


def tiny_batch(seed=0):
    rng = np.random.RandomState(seed)
    return {
        "audio": rng.randn(2, 3200).astype(np.float32) * 0.1,
        "audio_lens": np.full((2,), 3200, np.int32),
        "text": rng.randint(0, 36, (2, 10)).astype(np.int32),
        "text_mask": np.ones((2, 10), bool),
        "spk_ids": rng.randint(0, 4, (2, 10)).astype(np.int32),
    }


@pytest.mark.slow
def test_full_state_resume_bitexact(tmp_path):
    no_aug = SpecAugmentConfig(num_freq_masks=0, num_time_masks=0)
    tc = TrainConfig(batch_size=2, lr=1e-3, max_steps=100,
                     token_replace_prob=0.0)
    system = ASRSystem(TINY, tc, FE, no_aug, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    batch = tiny_batch()
    state = system.init_state(rng, batch)
    step = system.make_train_step(donate=False)

    # run 3 steps, checkpoint, run 2 more -> reference trajectory
    for i in range(3):
        state, _ = step(state, batch, jax.random.fold_in(rng, i))
    mgr = CheckpointManager(str(tmp_path))
    mgr.save_state(3, jax.device_get(state))
    ref = state
    for i in range(3, 5):
        ref, _ = step(ref, batch, jax.random.fold_in(rng, i))

    # resume from the checkpoint and replay the same 2 steps
    template = jax.device_get(system.init_state(rng, batch))
    restored = mgr.load_state(template)
    assert int(restored.step) == 3
    for i in range(3, 5):
        restored, _ = step(restored, batch, jax.random.fold_in(rng, i))

    for a, b in zip(jax.tree_util.tree_leaves(ref.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_device_prefetcher_order():
    items = list(range(7))
    seen = []
    pf = DevicePrefetcher(items, put_fn=lambda x: x * 10, depth=3)
    for x in pf:
        seen.append(x)
    assert seen == [i * 10 for i in items]

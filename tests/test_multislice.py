"""Multi-slice (DCN) mesh + sharded async checkpointing.

The reference's only distribution is single-cluster NCCL DDP
(tal/asr/train.py:101). Pod-scale TPU training adds (a) a hierarchical
('dcn','data','model') mesh where cross-slice traffic is confined to the
final gradient all-reduce, and (b) shard-parallel async checkpointing
(orbax) instead of full-host msgpack gathers. Both are exercised here on the
8-device virtual CPU platform: 2 slices x 2 data x 2 model.
"""
import os

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
from tal_asrd_tpu.core.checkpoint import ShardedCheckpointManager
from tal_asrd_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_multislice_mesh,
    param_shardings,
    shard_batch,
)
from tal_asrd_tpu.train import ASRSystem

TINY = ModelConfig(
    model_type="1x", num_speakers=4, n_mels=8, vocab_size=32, n_head=2,
    max_positions=64, dropout=0.1, embed_size=16, tds_depths=(1, 1, 1),
    tds_kernel=5,
)
FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


def _batch(b=8, t=3200, l=12, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "audio": jnp.asarray(rng.randn(b, t).astype(np.float32) * 0.1),
        "audio_lens": jnp.full((b,), t, jnp.int32),
        "text": jnp.asarray(rng.randint(0, 36, (b, l)), jnp.int32),
        "text_mask": jnp.ones((b, l), bool),
        "spk_ids": jnp.asarray(rng.randint(0, 4, (b, l)), jnp.int32),
    }


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_multislice_mesh(dcn=2, data=2, model=2,
                                devices=jax.devices()[:8])


def test_multislice_mesh_shape_and_batch_spec(mesh):
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    sh = batch_sharding(mesh, ndim=2)
    assert sh.spec == jax.sharding.PartitionSpec(("dcn", "data"), None)


@pytest.mark.slow
def test_multislice_train_step_matches_single_slice(mesh):
    """One LAMB step on the 2x2x2 multi-slice mesh must match the same step
    on a flat 4x2 single-slice mesh bit-for-bit (hierarchical vs flat
    all-reduce are both exact sums)."""
    tc = TrainConfig(batch_size=8, lr=1e-3, max_steps=10, grad_acc=1,
                     num_data_shards=4)
    system = ASRSystem(TINY, tc, FE, SpecAugmentConfig(), dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    state0 = system.init_state(rng, batch)

    flat = make_mesh(data=4, model=2, devices=jax.devices()[:8])
    out = {}
    for name, m in (("multislice", mesh), ("flat", flat)):
        state = system.shard_state(m, state0)
        step = system.make_train_step(m, donate=False)
        new_state, metrics = step(state, shard_batch(m, batch), rng)
        out[name] = (
            float(metrics["loss"]),
            jax.device_get(new_state.params),
        )
    assert np.isclose(out["multislice"][0], out["flat"][0], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(out["multislice"][1]),
                    jax.tree_util.tree_leaves(out["flat"][1])):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_sharded_async_checkpoint_roundtrip(mesh, tmp_path):
    """Save a mesh-sharded TrainState shard-parallel + async, restore it onto
    the mesh, and verify bit-exactness and sharding preservation."""
    tc = TrainConfig(batch_size=8, lr=1e-3, max_steps=10,
                     num_data_shards=4)
    system = ASRSystem(TINY, tc, FE, SpecAugmentConfig(), dtype=jnp.float32)
    batch = _batch()
    rng = jax.random.PRNGKey(1)
    state = system.shard_state(mesh, system.init_state(rng, batch))
    step = system.make_train_step(mesh, donate=False)
    state, _ = step(state, shard_batch(mesh, batch), rng)

    mgr = ShardedCheckpointManager(str(tmp_path / "sharded"), async_save=True)
    mgr.save_state(3, state)
    mgr.wait_until_finished()
    assert mgr.latest_state_step() == 3

    # fresh template with the right shardings but wrong values
    template = system.shard_state(
        mesh, system.init_state(jax.random.PRNGKey(99), batch))
    restored = mgr.load_state(template, 3)
    mgr.close()

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(jax.device_get(state))[0],
        jax.tree_util.tree_flatten_with_path(jax.device_get(restored))[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    # shardings preserved on the restored tree
    for leaf, tmpl in zip(jax.tree_util.tree_leaves(restored.params),
                          jax.tree_util.tree_leaves(template.params)):
        assert leaf.sharding.is_equivalent_to(tmpl.sharding, leaf.ndim)


@pytest.mark.slow
def test_window_parallel_sharded_decode(mesh):
    """Window-batched decode sharded over the data axes matches the
    unsharded single-device decode bit-for-bit (embarrassingly parallel:
    replicated params, batch split across chips)."""
    from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search
    from tal_asrd_tpu.decode.sharded import make_sharded_decode
    from tal_asrd_tpu.models import ASRModel

    model = ASRModel(TINY, FE, dtype=jnp.float32)
    b, t = 8, 3200
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (b, t)) * 0.1
    lens = jnp.full((b,), t, jnp.int32)
    prime = jnp.ones((b, 1), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, audio,
                           jnp.zeros((b, 4), jnp.int32), lens)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables)

    spec = BeamSearchSpec(
        beam_size=2, max_new_tokens=8, eos_id=1,
        vocab_size=TINY.num_tokens, text_vocab_size=TINY.vocab_size,
        force_output=True,
    )
    sharded = make_sharded_decode(model, spec, mesh)
    out_sh = sharded(variables, audio, lens, prime)

    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    out_ref = beam_search(model, variables, enc, prime, spec)

    np.testing.assert_array_equal(
        np.asarray(out_sh["tokens"]), np.asarray(out_ref["tokens"]))
    np.testing.assert_array_equal(
        np.asarray(out_sh["lengths"]), np.asarray(out_ref["lengths"]))
    # outputs really are sharded over the data axes
    assert not out_sh["tokens"].sharding.is_fully_replicated


def test_episode_parallel_sharded_unaligned(mesh):
    """Long-form serving shape: N episodes sharded over the data axes, each
    shard running lockstep lanes through the vmapped unaligned machine.
    Tokens must match the unsharded lane-batched run."""
    from tal_asrd_tpu.decode.sharded import make_sharded_unaligned
    from tal_asrd_tpu.decode.unaligned import (
        UnalignedSpec,
        unaligned_decode_batched,
    )
    from tal_asrd_tpu.models import ASRModel

    model = ASRModel(TINY, FE, dtype=jnp.float32)
    n, t = 8, 6400
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (n, t)) * 0.1
    lens = jnp.full((n,), t, jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, audio[:, :3200],
                           jnp.zeros((n, 4), jnp.int32), lens - 3200)
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.3 if x.ndim == 0 else x, variables)

    spec = UnalignedSpec(
        eos_id=1, chunk_size=16, max_positions=32, stall_patience=4,
        max_tokens=48, max_iters=120, max_outer=24,
    )
    sharded = make_sharded_unaligned(model, spec, mesh)
    out_sh = sharded(variables, audio, lens)

    enc = model.apply(variables, audio, lens, False, method=ASRModel.encode)
    mask = enc.get("encoder_padding_mask")
    ns = ((~mask).sum(-1).astype(jnp.int32) if mask is not None
          else jnp.full((n,), enc["encoder_out"].shape[1], jnp.int32))
    out_ref = unaligned_decode_batched(model, variables, enc, ns, spec)

    np.testing.assert_array_equal(
        np.asarray(out_sh["num_tokens"]), np.asarray(out_ref["num_tokens"]))
    np.testing.assert_array_equal(
        np.asarray(out_sh["tokens"]), np.asarray(out_ref["tokens"]))
    # episodes really are split across the data axes
    assert not out_sh["tokens"].sharding.is_fully_replicated

"""Checkpointing tests: save/load round trip, encoder-only partial load,
embedding expansion for added speaker tokens (train.py:47-84 surgical-load
parity), checkpoint averaging, and the end-to-end trainer smoke (quick-test
mode) on a synthetic corpus.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.checkpoint import (
    CheckpointManager,
    average_params,
    expand_speaker_embeddings,
    filter_subtree,
    load_params_partial,
    load_pytree,
    merge_subtree,
    save_pytree,
)
from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig, TrainConfig
from tal_asrd_tpu.models import ASRModel
from tal_asrd_tpu.train import ASRSystem

TINY = ModelConfig(
    model_type="1x", num_speakers=4, n_mels=8, vocab_size=32, n_head=2,
    max_positions=64, dropout=0.0, embed_size=16, tds_depths=(1, 1, 1),
    tds_kernel=5,
)
TINY_FRONTEND = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


def make_params(cfg=TINY, seed=0):
    model = ASRModel(cfg, TINY_FRONTEND)
    audio = jnp.zeros((1, 3200), jnp.float32)
    y = jnp.zeros((1, 6), jnp.int32)
    lens = jnp.array([3200])
    return model.init({"params": jax.random.PRNGKey(seed)}, audio, y, lens)["params"]


def tree_equal(a, b):
    return all(
        np.allclose(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


def test_save_load_roundtrip(tmp_path):
    params = make_params()
    p = str(tmp_path / "ck.msgpack")
    save_pytree(p, params)
    loaded = load_pytree(p)
    assert tree_equal(params, loaded)


def test_encoder_only_partial_load(tmp_path):
    donor = make_params(seed=1)
    target = make_params(seed=2)
    merged = merge_subtree(target, "encoder", filter_subtree(donor, "encoder"))
    assert tree_equal(merged["encoder"], donor["encoder"])
    # everything else untouched
    assert tree_equal(merged["decoder_proj"], target["decoder_proj"])


def test_embedding_expansion():
    emb = np.random.RandomState(0).randn(36, 16).astype(np.float32)
    bigger = expand_speaker_embeddings(emb, 40)
    assert bigger.shape == (40, 16)
    np.testing.assert_array_equal(bigger[:36], emb)
    bound = 1 / np.sqrt(16)
    assert (np.abs(bigger[36:]) <= bound).all()


def test_partial_load_with_expansion():
    small_cfg = TINY
    big_cfg = ModelConfig(**{**TINY.__dict__, "num_speakers": 8})
    donor = make_params(small_cfg, seed=1)       # 36-token embedding
    target = make_params(big_cfg, seed=2)        # 40-token embedding
    merged = load_params_partial(
        target, donor, strict=True,
        expand_embeddings_to=big_cfg.vocab_size + big_cfg.num_speakers,
    )
    np.testing.assert_allclose(
        np.asarray(merged["embedding"]["embedding"])[:36],
        np.asarray(donor["embedding"]["embedding"]),
    )


def test_partial_load_nonstrict_skips_mismatch():
    donor = make_params(TINY, seed=1)
    big_cfg = ModelConfig(**{**TINY.__dict__, "num_speakers": 8})
    target = make_params(big_cfg, seed=2)
    merged = load_params_partial(target, donor, strict=False)
    # mismatched embedding kept from target; matching leaves taken from donor
    np.testing.assert_allclose(
        np.asarray(merged["embedding"]["embedding"]),
        np.asarray(target["embedding"]["embedding"]),
    )
    np.testing.assert_allclose(
        np.asarray(merged["decoder_proj"]["kernel"]),
        np.asarray(donor["decoder_proj"]["kernel"]),
    )


def test_average_params():
    a = {"w": np.ones((2, 2), np.float32)}
    b = {"w": np.full((2, 2), 3.0, np.float32)}
    avg = average_params([a, b])
    np.testing.assert_allclose(avg["w"], 2.0)


def test_checkpoint_manager(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    for s in [10, 20, 30]:
        mgr.save(s, {"w": np.full((2,), float(s))})
    assert mgr.steps() == [10, 20, 30]
    np.testing.assert_allclose(mgr.load()["w"], 30.0)
    np.testing.assert_allclose(mgr.average_last(2)["w"], 25.0)


@pytest.mark.slow
def test_trainer_quick_test(tmp_path):
    """fast_dev_run analog: one batch of train+val, one checkpoint written."""
    from tal_asrd_tpu.data import AlignedDataset, BucketedCollater, DataLoader, ShardedSampler
    from tal_asrd_tpu.train.loop import Trainer, TrainerConfig
    from tal_asrd_tpu.utils.logging import MetricsLogger
    from tests.synthetic_corpus import build_corpus, build_tokenizer

    root = str(tmp_path / "corpus")
    build_corpus(root, n_episodes=1, episode_seconds=30.0)
    tok = build_tokenizer(root)

    cfg = ModelConfig(**{**TINY.__dict__, "vocab_size": len(tok), "num_speakers": 4})
    tc = TrainConfig(batch_size=2, lr=1e-3, max_steps=10)
    system = ASRSystem(cfg, tc, TINY_FRONTEND, dtype=jnp.float32)

    ds = AlignedDataset(root, tok, num_utterances=1, min_segment_duration=1.0,
                        return_spk_ids=True)
    coll = BucketedCollater(tok.pad_token_id, audio_bucket_seconds=(5, 10),
                            text_buckets=(16, 32))
    dl = DataLoader(ds, batch_size=2, collate_fn=coll,
                    sampler=ShardedSampler(len(ds), shuffle=True), num_workers=0)

    rng = jax.random.PRNGKey(0)
    batch0 = next(iter(dl))
    state = system.init_state(rng, batch0)

    trainer = Trainer(
        system,
        TrainerConfig(max_epochs=2, quick_test=True,
                      checkpoint_dir=str(tmp_path / "ckpts")),
        logger=MetricsLogger(out_dir=str(tmp_path / "out"), use_wandb=False),
    )
    state = trainer.fit(state, dl, dl, rng)
    assert len(trainer.ckpt.steps()) == 1

"""End-to-end tests for the evaluation runner (aligned + unaligned test-step
workflows), speaker-embedding export, the contrastive metric head, and the
separate-diarization baseline (SD training + reconciliation)."""
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import (
    DecodeConfig,
    FrontendConfig,
    ModelConfig,
    SDModelConfig,
    TrainConfig,
)
from tal_asrd_tpu.baseline import (
    SDSystem,
    frame_gold_speakers,
    merge_asr_sd,
)
from tal_asrd_tpu.eval.gen_embed import generate_speaker_embeddings, save_split
from tal_asrd_tpu.eval.runner import EvalRunner
from tal_asrd_tpu.models import ASRModel
from tal_asrd_tpu.train.embed_system import (
    ContrastiveCollator,
    ContrastiveDataset,
    EmbedSystem,
)
from tests.synthetic_corpus import build_tokenizer

TINY_FRONTEND = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    return build_tokenizer(str(tmp_path_factory.mktemp("tok")), vocab_size=120)


@pytest.fixture(scope="module")
def tiny_model(tok):
    cfg = ModelConfig(
        model_type="1x", num_speakers=3, n_mels=8, vocab_size=len(tok),
        n_head=2, max_positions=48, dropout=0.0, embed_size=8,
        tds_depths=(1, 1, 1), tds_kernel=5,
    )
    model = ASRModel(cfg, TINY_FRONTEND)
    audio = jnp.zeros((1, 8000), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, audio,
        jnp.zeros((1, 4), jnp.int32), jnp.array([8000]),
    )
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.2 if x.ndim == 0 else x, variables
    )
    return model, variables, cfg


def make_batch(tok, cfg, b=2, t=8000, l=10, seed=0):
    rng = np.random.RandomState(seed)
    text = rng.randint(4, len(tok), (b, l)).astype(np.int32)
    text[:, 0] = tok.eos_token_id
    text[:, -2] = len(tok) + 1  # speaker token
    text[:, -1] = tok.eos_token_id
    return {
        "audio": rng.randn(b, t).astype(np.float32) * 0.1,
        "audio_lens": np.full((b,), t, np.int32),
        "text": text,
        "text_mask": np.ones((b, l), bool),
        "spk_ids": np.ones((b, l), np.int32),
    }


def test_eval_runner_aligned(tmp_path, tok, tiny_model):
    model, variables, cfg = tiny_model
    runner = EvalRunner(model, variables, tok, DecodeConfig(beam_size=2),
                        out_dir=str(tmp_path))
    batch = make_batch(tok, cfg)
    refs = [[{"utterance": "ref one", "speaker": "a"}],
            [{"utterance": "ref two", "speaker": "b"}]]
    metrics = runner.test_step_aligned(batch, refs)
    assert np.isfinite(metrics["loss"])
    result = runner.test_end()
    assert np.isfinite(result["test_loss"])
    # outputs written
    assert os.path.exists(tmp_path / "test_result.pkl")
    with open(tmp_path / "test_result.pkl", "rb") as f:
        pairs = pickle.load(f)
    assert len(pairs) == 2
    assert pairs[0][0] == refs[0]
    ref_lines = open(tmp_path / "ref.txt").read().strip().split("\n")
    assert ref_lines == ["ref one", "ref two"]


@pytest.mark.slow  # 33s; the aligned runner test keeps the fast-tier
# eval-runner representative, and the unaligned machine is covered by
# test_unaligned.py.
def test_eval_runner_unaligned(tmp_path, tok, tiny_model):
    model, variables, cfg = tiny_model
    from tal_asrd_tpu.decode.unaligned import UnalignedSpec

    runner = EvalRunner(model, variables, tok, DecodeConfig(),
                        out_dir=str(tmp_path))
    audio = np.random.RandomState(0).randn(32000).astype(np.float32) * 0.1
    spec = UnalignedSpec(
        eos_id=tok.eos_token_id, chunk_size=32, max_positions=48,
        stall_patience=6, max_tokens=96, max_iters=200, max_outer=40,
    )
    info = runner.test_step_unaligned(
        audio, len(audio), [{"utterance": "gold text", "speaker": "a"}],
        spec=spec,
    )
    assert info["num_tokens"] > 1
    with open(tmp_path / "test_result.pkl", "rb") as f:
        pairs = pickle.load(f)
    _, hyps = pairs[0]
    for h in hyps:
        assert "attention" in h and "chunkStart" in h and "utteranceTokens" in h
        assert h["attention"].shape[0] == len(h["utteranceTokens"])


def test_gen_embed_and_contrastive(tmp_path, tok, tiny_model):
    model, variables, cfg = tiny_model
    batches = [make_batch(tok, cfg, seed=s) for s in range(3)]
    embs, sids = generate_speaker_embeddings(model, variables, batches)
    # each sample has exactly 1 speaker-token target position
    assert embs.shape == (6, cfg.embed_size)
    assert set(sids) == {1}
    save_split(embs, sids, str(tmp_path / "spk"))
    assert os.path.exists(tmp_path / "spk.train.pkl")

    # Contrastive system on separable synthetic embeddings
    rng = np.random.RandomState(0)
    emb = np.concatenate([
        rng.randn(40, 8) * 0.05 + np.eye(8)[i % 8] for i in range(4)
    ])
    ids = np.repeat(np.arange(4), 40)
    ds = ContrastiveDataset(emb, ids, n_way=4, epoch_len=64)
    coll = ContrastiveCollator()
    system = EmbedSystem(in_dim=8, hidden=32, out_dim=8, batch_size=16)

    def batches_gen():
        for i in range(0, 64, 16):
            yield coll([ds[j] for j in range(i, i + 16)])

    losses, accs = system.fit(batches_gen())
    assert np.isfinite(losses).all()
    _, acc = system.evaluate(batches_gen())
    assert acc > 0.5


@pytest.mark.slow  # 31s training loop; train-loop coverage lives in test_train.
def test_sd_system_trains(tmp_path):
    from tal_asrd_tpu.core.config import SpecAugmentConfig

    cfg = SDModelConfig(num_speakers=5, n_mels=8, dropout=0.0, embed_size=16,
                        tds_depths=(1, 1, 1), tds_kernel=5)
    tc = TrainConfig(batch_size=2, lr=2e-4, max_steps=50)
    no_aug = SpecAugmentConfig(num_freq_masks=0, num_time_masks=0)
    system = SDSystem(cfg, tc, TINY_FRONTEND, no_aug, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(2, 8000).astype(np.float32) * 0.1,
        "audio_lens": np.full((2,), 8000, np.int32),
        "speaker": np.array([1, 3], np.int32),
    }
    state = system.init_state(jax.random.PRNGKey(0), batch)
    step = system.make_train_step()
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert 0.0 <= float(metrics["spk_acc"]) <= 1.0


def test_reconcile_helpers():
    utts = [
        {"utterance_start": 0.0, "utterance_end": 2.0, "speaker": "a"},
        {"utterance_start": 2.0, "utterance_end": 4.0, "speaker": "b"},
    ]
    gold = frame_gold_speakers(utts, n_frames=40)
    # frame centers: i*0.08 + 0.705
    assert gold[0] == "a"
    assert gold[30] == "b"  # center 3.1s

    sd_ids = np.array([0] * 25 + [1] * 25)
    hyps = [
        {"utterance": "hello", "utterance_start": 0.0, "utterance_end": 1.9},
        {"utterance": "world", "utterance_start": 2.1, "utterance_end": 3.9},
    ]
    feats = np.random.RandomState(0).randn(50, 4)
    merged = merge_asr_sd(hyps, sd_ids, feats)
    assert merged[0][1][1] == 0
    assert merged[1][1][1] == 1
    assert merged[0][1][0].shape == (4,)


@pytest.mark.slow
def test_eval_runner_unaligned_batched_matches_sequential(tmp_path, tok,
                                                          tiny_model):
    """Grouped-lane unaligned eval (cli/test.py --unaligned-lanes) must be
    bit-identical per episode to the sequential loop."""
    model, variables, cfg = tiny_model
    from tal_asrd_tpu.decode.unaligned import UnalignedSpec

    spec = UnalignedSpec(
        eos_id=tok.eos_token_id, chunk_size=32, max_positions=48,
        stall_patience=6, max_tokens=96, max_iters=200, max_outer=40,
    )
    rng = np.random.RandomState(0)
    audios = [rng.randn(32000).astype(np.float32) * 0.1 for _ in range(2)]
    refs = [[{"utterance": "gold one", "speaker": "a"}],
            [{"utterance": "gold two", "speaker": "b"}]]

    seq = EvalRunner(model, variables, tok, DecodeConfig(),
                     out_dir=str(tmp_path / "seq"))
    for a, r in zip(audios, refs):
        seq.test_step_unaligned(a, len(a), r, spec=spec)

    bat = EvalRunner(model, variables, tok, DecodeConfig(),
                     out_dir=str(tmp_path / "bat"))
    infos = bat.test_step_unaligned_batched(audios, len(audios[0]), refs,
                                            spec=spec)
    assert len(infos) == 2

    with open(tmp_path / "seq" / "test_result.pkl", "rb") as f:
        pairs_s = pickle.load(f)
    with open(tmp_path / "bat" / "test_result.pkl", "rb") as f:
        pairs_b = pickle.load(f)
    assert len(pairs_s) == len(pairs_b) == 2
    for (ref_s, hyp_s), (ref_b, hyp_b) in zip(pairs_s, pairs_b):
        assert ref_s == ref_b
        assert len(hyp_s) == len(hyp_b)
        for es, eb in zip(hyp_s, hyp_b):
            assert es["utterance"] == eb["utterance"]
            assert es["speakerId"] == eb["speakerId"]
            assert list(es["utteranceTokens"]) == list(eb["utteranceTokens"])
            np.testing.assert_array_equal(es["chunkStart"], eb["chunkStart"])
            # align_attn is stored bf16; vmap changes fusion order, so the
            # attention floats agree to bf16 ULP, not bitwise
            np.testing.assert_allclose(es["attention"], eb["attention"],
                                       rtol=1e-2, atol=1e-3)

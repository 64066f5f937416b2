"""Misc coverage: generation spot-check hook, LibriSpeech formatter tool,
profiling timer, metrics logger."""
import json
import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, ModelConfig, TrainConfig
from tal_asrd_tpu.train import ASRSystem
from tal_asrd_tpu.utils.logging import MetricsLogger
from tal_asrd_tpu.utils.profiling import StepTimer
from tests.synthetic_corpus import build_tokenizer

TINY = ModelConfig(
    model_type="1x", num_speakers=3, n_mels=8, vocab_size=32, n_head=2,
    max_positions=48, dropout=0.0, embed_size=8, tds_depths=(1, 1, 1),
    tds_kernel=5,
)
FE = FrontendConfig(n_mels=8, n_fft=64, win_length=64, hop_length=32)


@pytest.mark.slow
def test_generation_spotcheck_hook(tmp_path):
    tok = build_tokenizer(str(tmp_path), vocab_size=60)
    cfg = ModelConfig(**{**TINY.__dict__, "vocab_size": len(tok)})
    system = ASRSystem(cfg, TrainConfig(batch_size=2, lr=1e-3),
                       FE, dtype=jnp.float32)
    rng = np.random.RandomState(0)
    batch = {
        "audio": rng.randn(2, 4800).astype(np.float32) * 0.1,
        "audio_lens": np.full((2,), 4800, np.int32),
        "text": rng.randint(4, len(tok), (2, 8)).astype(np.int32),
        "text_mask": np.ones((2, 8), bool),
        "spk_ids": np.zeros((2, 8), np.int32),
    }
    state = system.init_state(jax.random.PRNGKey(0), batch)
    logger = MetricsLogger(out_dir=str(tmp_path / "out"), use_wandb=False)
    hook = system.make_generation_spotcheck(tok, batch)
    hook(state, 1, logger)
    lines = open(logger.path).read().strip().split("\n")
    rec = json.loads(lines[-1])
    assert rec["type"] == "generation"
    assert rec["ref"] is not None


def test_librispeech_formatter(tmp_path):
    from tal_asrd_tpu.cli import tools
    from tal_asrd_tpu.data.audio_io import write_wav

    src = tmp_path / "ls" / "19" / "198"
    os.makedirs(src)
    rng = np.random.RandomState(0)
    with open(src / "19-198.trans.txt", "w") as f:
        for i in range(3):
            utt = f"19-198-{i:04d}"
            f.write(f"{utt} HELLO WORLD NUMBER {i}\n")
            write_wav(str(src / f"{utt}.wav"),
                      rng.randn(8000).astype(np.float32) * 0.1)
    out = tmp_path / "corpus"
    tools.main(["librispeech-format", "--src", str(tmp_path / "ls"),
                "--out-dir", str(out)])
    with open(out / "transcript.pkl", "rb") as f:
        transcripts = pickle.load(f)
    assert "19-198" in transcripts
    utts = transcripts["19-198"]
    assert len(utts) == 3
    assert utts[0]["utterance"] == "hello world number 0"
    np.testing.assert_allclose(utts[1]["utterance_start"], 0.5, atol=1e-3)
    assert os.path.exists(out / "19-198.wav")


def test_step_timer():
    t = StepTimer()
    import time

    for _ in range(3):
        with t:
            time.sleep(0.01)
    # Lower bound only: wall-clock sleeps stretch arbitrarily on a loaded
    # single-core box, so an upper bound is inherently flaky.
    assert t.mean_s > 0.005
    assert t.audio_hours_per_hour(30.0) > 0

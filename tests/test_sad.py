"""Neural SAD (PyanNet) tests: frame math, labels, scoring alignment, and the
train->score->binarize->eval CLI chain (reference /root/reference/tal/vad/
__init__.py:195-258 capability)."""
import json
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tal_asrd_tpu.vad.pyannet import (
    FRAME_HOP, SAMPLE_RATE, PyanNet, frame_labels, n_frames, score_episode)


def test_n_frames_matches_model_output():
    win = FRAME_HOP * 59  # ~1 s snapped to the frame grid
    model = PyanNet(lstm_hidden=8, ff_hidden=8, conv_channels=8)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, win)))["params"]
    out = model.apply({"params": params}, jnp.zeros((2, win)))
    assert out.shape == (2, n_frames(win)) == (2, 59)


def test_frame_labels_mark_bound_interiors():
    win = FRAME_HOP * 59
    lab = frame_labels([(0.2, 0.5)], win)
    centers = (np.arange(n_frames(win)) + 0.5) * FRAME_HOP / SAMPLE_RATE
    assert lab.shape == (59,)
    np.testing.assert_array_equal(lab, ((centers >= 0.2) & (centers < 0.5)))
    # window offset shifts which frames are inside the bound
    lab_off = frame_labels([(0.2, 0.5)], win, offset_s=0.3)
    np.testing.assert_array_equal(
        lab_off, ((centers + 0.3 >= 0.2) & (centers + 0.3 < 0.5)))


def test_score_episode_alignment_and_length():
    model = PyanNet(lstm_hidden=8, ff_hidden=8, conv_channels=8)
    win = FRAME_HOP * 59
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, win)))["params"]
    wav = np.random.default_rng(0).normal(size=5 * SAMPLE_RATE).astype(np.float32)
    scores = score_episode(params, wav, window_s=1.0, batch=2, model=model)
    assert scores.shape == (n_frames(len(wav)),)
    assert np.all((scores >= 0) & (scores <= 1))


def _speech_corpus(root, n_episodes=2, episode_seconds=24.0, seed=0):
    """Corpus whose utterances are loud tone bursts over near-silence, so a
    tiny SAD can actually learn the task."""
    from tal_asrd_tpu.data.audio_io import write_wav
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    transcripts = {}
    sr = SAMPLE_RATE
    for e in range(n_episodes):
        stub = f"ep{e}"
        audio = (rng.randn(int(episode_seconds * sr)) * 0.002).astype(np.float32)
        utts = []
        t = 0.7
        i = 0
        while t + 2.5 < episode_seconds - 0.5:
            dur = 1.0 + rng.rand()
            a, b = int(t * sr), int((t + dur) * sr)
            tt = np.arange(b - a) / sr
            audio[a:b] += (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * tt)
                           ).astype(np.float32)
            utts.append({"utterance": "x", "speaker": "s",
                         "utterance_start": float(t),
                         "utterance_end": float(t + dur)})
            t += dur + 0.8 + rng.rand()
            i += 1
        write_wav(os.path.join(root, stub + ".wav"), audio, sr)
        transcripts[stub] = utts
    with open(os.path.join(root, "transcript.pkl"), "wb") as f:
        pickle.dump(transcripts, f)


@pytest.mark.slow
def test_sad_cli_end_to_end(tmp_path):
    from tal_asrd_tpu.cli.sad import main
    train = str(tmp_path / "train")
    test = str(tmp_path / "test")
    _speech_corpus(train, n_episodes=2, seed=0)
    _speech_corpus(test, n_episodes=1, seed=7)
    out = str(tmp_path / "sad")
    jout = str(tmp_path / "sad_metrics.json")
    main(["--train-data", train, "--test-data", test, "--out-dir", out,
          "--steps", "120", "--batch-size", "4", "--window-secs", "1.0",
          "--json-out", jout, "--seed", "0"])
    metrics = json.load(open(jout))
    assert set(metrics) == {"sad_precision_pct", "sad_recall_pct",
                            "sad_f1_pct"}
    # tone-vs-silence is trivially learnable; anything below this means the
    # chain (labels, training, scoring, binarize) is broken, not undertrained
    assert metrics["sad_f1_pct"] > 60.0
    assert os.path.exists(os.path.join(out, "sad_bounds.pkl"))
    assert os.path.exists(os.path.join(out, "corpus.rttm"))
    assert os.path.exists(os.path.join(out, "pyannet.msgpack"))

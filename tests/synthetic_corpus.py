"""Synthetic TAL-format corpus builder for tests: episodes of noise audio with
utterance dicts in the reference transcript.pkl layout
(tal/asr/data/aligned.py:110-123), a speaker_map.json, and a trained BPE
tokenizer."""
import json
import os
import pickle

import numpy as np

from tal_asrd_tpu.data.audio_io import write_wav
from tal_asrd_tpu.text import BpeTokenizer, BpeTrainer

SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "a lazy dog sleeps near the door",
    "the host introduces the show",
    "our subject tells a long story",
    "the interviewer asks a question",
    "music plays in the background",
]
SPEAKERS = ["ira glass", "jane doe", "john smith"]


def build_corpus(root, n_episodes=2, episode_seconds=40.0, sr=16000, seed=0,
                 with_alignments=False):
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    transcripts = {}
    for e in range(n_episodes):
        stub = f"ep{e}"
        audio = (rng.randn(int(episode_seconds * sr)) * 0.05).astype(np.float32)
        write_wav(os.path.join(root, stub + ".wav"), audio, sr)
        utts = []
        t = 0.5
        i = 0
        while t + 3.0 < episode_seconds - 1.0:
            dur = 2.0 + rng.rand() * 2.0
            text = SENTENCES[i % len(SENTENCES)]
            utt = {
                "utterance": text,
                "speaker": SPEAKERS[i % len(SPEAKERS)],
                "utterance_start": float(t),
                "utterance_end": float(t + dur),
                "role": ["host", "interviewer", "subject"][i % 3],
            }
            if with_alignments:
                words = text.split()
                step = dur / len(words)
                utt["alignments"] = [
                    (float(t + k * step), float(t + (k + 1) * step), k)
                    for k in range(len(words))
                ]
            utts.append(utt)
            t += dur + 0.2
            i += 1
        transcripts[stub] = utts

    with open(os.path.join(root, "transcript.pkl"), "wb") as f:
        pickle.dump(transcripts, f)
    with open(os.path.join(root, "speaker_map.json"), "w") as f:
        json.dump({name: i for i, name in enumerate(SPEAKERS)}, f)
    return transcripts


def build_tokenizer(tmpdir, vocab_size=300):
    model = BpeTrainer(vocab_size=vocab_size).train(SENTENCES * 30)
    path = os.path.join(tmpdir, "bpe.model")
    model.save(path)
    return BpeTokenizer(model_path=path)

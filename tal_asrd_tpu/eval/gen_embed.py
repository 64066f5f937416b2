"""Speaker-embedding export from a trained speaker-token model.

Parity target: /root/reference/tal/asr/gen_embed.py:70-124 — run the joint
model teacher-forced over a split; at every target position that holds a
speaker token, softmax the speaker-token slice of the logits and take the
expectation over the speaker-token embedding rows:

    probs = softmax(logits[:, vocab:])                  # over speakers
    expected_embed = probs @ E[vocab:]                  # [n, embed_size]

saving (embeddings, speaker_ids) with an 80/20 train/valid split. The whole
batch computation is one jitted function (the reference masks/selects on
device per batch too, but re-decodes in fp16 through Lightning/apex).
"""
from __future__ import annotations

import pickle
from typing import Iterable, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.models.asr import ASRModel


def make_embed_fn(model: ASRModel):
    vocab = model.cfg.vocab_size

    @jax.jit
    def batch_embeddings(variables, audio, audio_lens, text):
        y_prev, y_target = text[:, :-1], text[:, 1:]
        (logits, _), _ = model.apply(variables, audio, y_prev, audio_lens,
                                     train=False)
        spk_embed_rows = variables["params"]["embedding"]["embedding"][vocab:]
        spk_logits = logits[..., vocab:]
        probs = jax.nn.softmax(spk_logits.astype(jnp.float32), axis=-1)
        expected = probs @ spk_embed_rows.astype(jnp.float32)  # [B, L, E]
        speaker_mask = y_target >= vocab
        speaker_ids = jnp.where(speaker_mask, y_target - vocab, -1)
        return expected, speaker_mask, speaker_ids

    return batch_embeddings


def generate_speaker_embeddings(model: ASRModel, variables, batches: Iterable
                                ) -> Tuple[np.ndarray, np.ndarray]:
    """Collect (embeddings [N, E], speaker_ids [N]) over speaker-token
    positions of all batches."""
    fn = make_embed_fn(model)
    embs, sids = [], []
    for batch in batches:
        expected, mask, ids = fn(
            variables,
            jnp.asarray(batch["audio"]),
            jnp.asarray(batch["audio_lens"]),
            jnp.asarray(batch["text"]),
        )
        # exclude padded positions
        mask = np.asarray(mask) & np.asarray(batch["text_mask"])[:, 1:]
        expected = np.asarray(expected)
        ids = np.asarray(ids)
        embs.append(expected[mask])
        sids.append(ids[mask])
    return np.concatenate(embs, axis=0), np.concatenate(sids, axis=0)


def save_split(embeddings: np.ndarray, speaker_ids: np.ndarray,
               out_path: str, train_frac: float = 0.8) -> None:
    """80/20 split saved as pickles (gen_embed.py:119-123 .pt analog)."""
    n_train = int(len(embeddings) * train_frac)
    with open(out_path + ".train.pkl", "wb") as f:
        pickle.dump((embeddings[:n_train], speaker_ids[:n_train]), f)
    with open(out_path + ".valid.pkl", "wb") as f:
        pickle.dump((embeddings[n_train:], speaker_ids[n_train:]), f)

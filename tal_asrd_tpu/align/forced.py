"""Word-level forced alignment.

Capability target: the aeneas pipeline (/root/reference/tal/alignment/
aeneas.py:30-236) — per-utterance word alignments [(begin_s, end_s,
word_token_ix)] merged into transcript-aligned.pkl, with skip-if-exists
resume. aeneas synthesizes the text with espeak and DTWs MFCCs; this
environment has no TTS, so the aligner is model-based and TPU-idiomatic:

  * teacher-force the utterance's tokens through the joint ASR model over the
    utterance audio and read the per-token cross-attention (mean over layers,
    an explicit output of decode());
  * enforce monotonicity by DTW over the negative log attention matrix
    (tokens x encoder frames);
  * group tokens into words at decode boundaries; a word spans the frames of
    its tokens (encoder frame = 80 ms hop at 8x reduction).

An audio-to-audio MFCC DTW path (align/dtw.py + align/mfcc.py) covers the
aeneas-style use when a reference rendition of the text IS available.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.align.dtw import monotonic_segmentation
from tal_asrd_tpu.data.audio_io import DEFAULT_SR, load_audio_segment
from tal_asrd_tpu.models.asr import ASRModel

ENC_FRAME_S = 0.08  # encoder output hop: 8 x 10 ms


def token_word_groups(tokenizer, token_ids: Sequence[int]) -> List[Tuple[int, int]]:
    """Group token indices into words at decode boundaries: token i opens a
    new word when appending it to the running slice introduces a space."""
    groups: List[Tuple[int, int]] = []
    last = 0
    ids = list(token_ids)
    for i in range(1, len(ids)):
        if " " in tokenizer.decode(ids[last : i + 1]):
            groups.append((last, i))
            last = i
    if last < len(ids):
        groups.append((last, len(ids)))
    return groups


def attention_alignment_matrix(model: ASRModel, variables, audio: np.ndarray,
                               token_ids: Sequence[int]) -> np.ndarray:
    """[n_tokens, enc_frames] mean cross-attention under teacher forcing."""
    toks = jnp.asarray([list(token_ids)], jnp.int32)
    enc = model.apply(
        variables, jnp.asarray(audio[None]), jnp.asarray([len(audio)]), False,
        method=ASRModel.encode,
    )
    _, attn = model.apply(variables, toks, enc, True, method=ASRModel.decode)
    return np.asarray(jnp.mean(attn, axis=0)[0], np.float32)  # [L, S]


def align_utterance(
    model: ASRModel,
    variables,
    tokenizer,
    audio: np.ndarray,
    text: str,
    utterance_start_s: float = 0.0,
) -> List[Tuple[float, float, int]]:
    """Word alignments [(begin_s, end_s, word_ix)] for one utterance
    (absolute times offset by utterance_start_s; aeneas output contract)."""
    token_ids = tokenizer.encode(text, bos_token=False, eos_token=False)
    if not token_ids:
        return []
    attn = attention_alignment_matrix(model, variables, audio, token_ids)
    # DTW over -log attention enforces a monotonic token->frame path
    cost = -np.log(attn + 1e-8)
    spans = monotonic_segmentation(cost)
    groups = token_word_groups(tokenizer, token_ids)
    # encoder frame duration derived from the actual output grid (0.08 s for
    # the production frontend; tiny test configs differ)
    frame_s = (len(audio) / DEFAULT_SR) / attn.shape[1]
    out = []
    for w_ix, (a, b) in enumerate(groups):
        f_start = spans[a][0]
        f_end = spans[b - 1][1]
        out.append((
            utterance_start_s + f_start * frame_s,
            utterance_start_s + f_end * frame_s,
            w_ix,
        ))
    return out


def align_episode(
    model: ASRModel,
    variables,
    tokenizer,
    data_dir: str,
    stub: str,
    utterances: List[dict],
    ext: str = ".wav",
    sample_rate: int = DEFAULT_SR,
    max_utt_seconds: float = 30.0,
) -> List[dict]:
    """Align every utterance of an episode; returns dicts with an
    `alignments` key added (aeneas.py:72-165 contract)."""
    path = os.path.join(data_dir, f"{stub}{ext}")
    out = []
    for utt in utterances:
        u = dict(utt)
        start, end = u["utterance_start"], u["utterance_end"]
        if end - start <= 0 or end - start > max_utt_seconds:
            u.setdefault("alignments", [])
            out.append(u)
            continue
        audio = load_audio_segment(path, start, end, sample_rate)
        try:
            u["alignments"] = align_utterance(
                model, variables, tokenizer, audio, u["utterance"], start
            )
        except Exception as e:
            print(f"[align] {stub} utterance failed: {e}")
            u.setdefault("alignments", [])
        out.append(u)
    return out


def full_force_align(
    model: ASRModel,
    variables,
    tokenizer,
    data_dir: str,
    out_path: Optional[str] = None,
    ext: str = ".wav",
) -> dict:
    """Align a whole split, writing transcript-aligned.pkl; episodes already
    present in the output are skipped (aeneas.py:36-38 resume)."""
    from tal_asrd_tpu.data.transcript import load_transcripts

    out_path = out_path or os.path.join(data_dir, "transcript-aligned.pkl")
    done = {}
    if os.path.exists(out_path):
        with open(out_path, "rb") as f:
            done = pickle.load(f)
    transcripts = load_transcripts(data_dir)
    for stub, utts in transcripts.items():
        if stub in done:
            continue
        done[stub] = align_episode(
            model, variables, tokenizer, data_dir, stub, utts, ext
        )
        with open(out_path, "wb") as f:
            pickle.dump(done, f)
    return done

"""Standalone long-audio transcription: overlapped windows + batch decode +
longest-match splicing.

Parity target: /root/reference/tal/asr/transcribe.py:29-210 — fixed windows
(e.g. 20-40 s) with K% overlap, batches of windows decoded together, then
adjacent window texts spliced at their longest common substring inside the
overlap region (difflib SequenceMatcher.find_longest_match; matches shorter
than 5 chars are ignored). Optional VAD pre-gating (:113-121).

TPU design: all windows of an episode form one (or few) fixed-shape batches
through the jitted encoder + KV-cached beam search — window-parallel decode
is the device-parallel replacement for the reference's sequential windows
(SURVEY §2.8); batches can additionally be sharded over the 'data' mesh axis.
The API drift of the reference (transcribe.py passes beam_width=/lm_weight=
which System.generate no longer accepts, :200-208) is resolved: the options
are honored here.
"""
from __future__ import annotations

from dataclasses import dataclass
from difflib import SequenceMatcher
from typing import List, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.data.audio_io import DEFAULT_SR, load_audio_segment
from tal_asrd_tpu.decode.beam import BeamSearchSpec, beam_search
from tal_asrd_tpu.vad.core import VadConfig, get_speech_frames


# ---------------------------------------------------------------------------
# Overlap splicing (transcribe.py:29-76 semantics)
# ---------------------------------------------------------------------------

def overlap_ix(a: str, b: str, word_overlap: int = 5):
    a_ix = len(a) - len(" ".join(a.split()[-word_overlap:]))
    b_ix = len(" ".join(b.split()[: word_overlap + 1]))
    return a_ix, b_ix


def splice_ix(a: str, b: str, word_overlap: int = 5):
    aix, bix = overlap_ix(a, b, word_overlap)
    match = SequenceMatcher(None, a, b).find_longest_match(aix, len(a), 0, bix)
    if not match or match.size < 5:  # < ~1-2 word match: keep both sides
        return len(a), 0
    return match.a, match.b


def splice_strings(strs: List[str], word_overlap: int = 20) -> str:
    if not strs:
        return ""
    if len(strs) == 1:
        return strs[0].strip()
    first_end, a_start = splice_ix(strs[0], strs[1], word_overlap)
    out = strs[0][:first_end].strip()
    for i in range(1, len(strs) - 1):
        a_end, b_start = splice_ix(strs[i], strs[i + 1], word_overlap)
        out += " " + strs[i][a_start:a_end].strip()
        a_start = b_start
    out += " " + strs[-1][a_start:].strip()
    return out


# ---------------------------------------------------------------------------
# Windowed transcription
# ---------------------------------------------------------------------------

@dataclass
class TranscribeConfig:
    window_seconds: float = 30.0
    overlap: float = 0.25            # fraction of window overlapped
    batch_size: int = 16
    beam_size: int = 4
    lm_weight: float = 0.0
    max_new_tokens: int = 120
    use_eot: bool = True             # terminate on EOT (vs EOS)
    speech_only: bool = False        # VAD pre-gate
    splice: bool = True
    sample_rate: int = DEFAULT_SR


class Transcriber:
    """Window-batched transcription around a model + tokenizer."""

    def __init__(self, model, variables, tokenizer, cfg: TranscribeConfig,
                 lm=None, lm_variables=None):
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.lm = lm
        self.lm_variables = lm_variables
        self._jit_cache = {}

    def _spec(self) -> BeamSearchSpec:
        c = self.cfg
        vocab = self.model.cfg.num_tokens
        eos = (self.tokenizer.eot_token_id if c.use_eot
               else self.tokenizer.eos_token_id)
        return BeamSearchSpec(
            beam_size=c.beam_size,
            max_new_tokens=c.max_new_tokens,
            eos_id=eos,
            vocab_size=vocab,
            text_vocab_size=len(self.tokenizer),
            lm_weight=c.lm_weight,
            force_output=True,
        )

    def _decode_fn(self, batch_shape):
        if batch_shape in self._jit_cache:
            return self._jit_cache[batch_shape]
        spec = self._spec()
        model, lm = self.model, self.lm

        @jax.jit
        def run(variables, audio, audio_lens, prime, lm_variables=None):
            enc = model.apply(variables, audio, audio_lens, False,
                              method=type(model).encode)
            return beam_search(model, variables, enc, prime, spec, lm,
                               lm_variables)

        self._jit_cache[batch_shape] = run
        return run

    def transcribe_batch(self, windows: Sequence[np.ndarray]) -> List[str]:
        c = self.cfg
        b = len(windows)
        t = max(len(w) for w in windows)
        audio = np.zeros((b, t), np.float32)
        lens = np.zeros((b,), np.int32)
        for i, w in enumerate(windows):
            audio[i, : len(w)] = w
            lens[i] = len(w)
        prime_id = (self.tokenizer.bos_token_id if c.use_eot
                    else self.tokenizer.eos_token_id)
        prime = np.full((b, 1), prime_id, np.int32)

        run = self._decode_fn((b, t))
        out = run(self.variables, jnp.asarray(audio), jnp.asarray(lens),
                  jnp.asarray(prime), self.lm_variables)
        texts = []
        lengths = np.asarray(out["lengths"])
        tokens = np.asarray(out["tokens"])
        for i in range(b):
            ids = tokens[i, 1 : lengths[i]]  # drop prime
            texts.append(self.tokenizer.decode(list(ids)))
        return texts

    def transcribe_file(self, audio_path: str, truncate: float = -1.0,
                        log: bool = False) -> str | List[str]:
        c = self.cfg
        x = load_audio_segment(audio_path, 0.0, None, c.sample_rate)
        if truncate > 0:
            x = x[: int(truncate * len(x))]
        if c.speech_only:
            x = get_speech_frames(x, VadConfig(sample_rate=c.sample_rate))
        return self.transcribe_array(x, log=log)

    def transcribe_array(self, x: np.ndarray, log: bool = False) -> str | List[str]:
        c = self.cfg
        window = int(c.window_seconds * c.sample_rate)
        stride = int(window * (1.0 - c.overlap))
        n_windows = max(int(np.ceil((len(x) - window) / stride)) + 1, 1)

        texts: List[str] = []
        batch: List[np.ndarray] = []
        for i in range(n_windows):
            w = x[stride * i : stride * i + window]
            if len(w) == 0:
                break
            # pad to full window for static decode shapes
            if len(w) < window:
                w = np.pad(w, (0, window - len(w)))
            batch.append(w)
            if len(batch) == c.batch_size or i == n_windows - 1:
                texts.extend(self.transcribe_batch(batch))
                batch = []
        if log:
            print(f"{n_windows} windows -> {len(texts)} texts")
        if c.splice:
            merge_window = 3 * int((window - stride) // c.sample_rate)
            return splice_strings(texts, max(merge_window, 5))
        return texts

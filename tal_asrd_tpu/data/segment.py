"""Shift-augmentation segment dataset.

ASRSegmentDataset equivalent (/root/reference/tal/asr/data/segment.py:56-301):
samples random 10-30 s windows stepped by segment_shift with +-5 s jitter,
collects intersecting utterances, truncates boundary utterances either
proportionally to the out-of-bounds time fraction (segment.py:241-281) or
word-alignment-exactly (data/util.py:125-203), emits '[UNINTELLIGIBLE]' for
empty windows, caps at max_tokens.
"""
from __future__ import annotations

import os
import random
from typing import Optional

import numpy as np

from tal_asrd_tpu.data.audio_io import DEFAULT_SR, load_audio_segment
from tal_asrd_tpu.data.format import (
    tokenize_utterances,
    tokenize_utterances_word_align,
)
from tal_asrd_tpu.data.transcript import (
    SpeakerIds,
    build_episode_durations,
    load_speaker_map,
)

UNK_PHRASE = "[UNINTELLIGIBLE]"


class SegmentDataset:
    def __init__(
        self,
        data_dir: str,
        tokenizer,
        speaker_map_loc: Optional[str] = None,
        min_segment_size: float = 10.0,
        segment_size: float = 30.0,
        segment_shift: float = 10.0,
        random_segment_shift: float = 5.0,
        max_tokens: int = 128,
        ext: str = ".wav",
        aligned_truncation: bool = False,
        tokenizer_speakers: bool = False,
        return_spk_ids: bool = False,
        sample_rate: int = DEFAULT_SR,
        rng: Optional[random.Random] = None,
        det_seed: Optional[int] = None,
    ):
        self.data_dir = data_dir
        self.ext = ext
        self.tokenizer = tokenizer
        self.segment_size = segment_size
        self.min_segment_size = min_segment_size
        self.segment_shift = segment_shift
        self.random_segment_shift = random_segment_shift
        self.max_tokens = max_tokens
        self.aligned_truncation = aligned_truncation
        self.tokenizer_speakers = tokenizer_speakers
        self.return_spk_ids = return_spk_ids
        self.sample_rate = sample_rate
        self.rng = rng or random
        # det_seed: derive the window jitter from (seed, item index) instead
        # of shared RNG state, so a VALIDATION segment set yields identical
        # windows every epoch (val_loss comparable across epochs/runs).
        self.det_seed = det_seed

        speaker_map = load_speaker_map(speaker_map_loc) if speaker_map_loc else None
        self.speaker_ids = SpeakerIds(
            speaker_map,
            first_speaker_id=len(tokenizer) if tokenizer_speakers else 0,
            tokenizer_speakers=tokenizer_speakers,
        )
        self.index = build_episode_durations(data_dir, ext)
        self.total_seconds = sum(d for _, _, d in self.index)

    def __len__(self) -> int:
        return int(self.total_seconds) // int(self.segment_shift)

    def __getitem__(self, i: int):
        # Locate the episode containing chunk i (segment.py:177-186)
        stub, utterances, f_duration = self.index[-1]
        for stub, utterances, f_duration in self.index:
            num_segments = int(f_duration // self.segment_shift)
            if i < num_segments:
                break
            i -= num_segments

        assert f_duration >= self.segment_size, (stub, f_duration)
        rng = (random.Random(self.det_seed * 1_000_003 + i)
               if self.det_seed is not None else self.rng)
        jitter = (rng.random() - 0.5) * 2 * self.random_segment_shift
        start_time = min(
            max(i * self.segment_shift + jitter, 0.0),
            f_duration - self.segment_size,
        )
        end_time = min(
            start_time
            + rng.random() * (self.segment_size - self.min_segment_size)
            + self.min_segment_size,
            f_duration,
        )

        # Intersecting utterances (segment.py:193-200)
        selected = []
        for j, utt in enumerate(utterances):
            if utt["utterance_end"] > start_time and utt["utterance_start"] <= end_time:
                selected.append((j, utt))
            elif selected:
                break

        if not selected:
            tokens = self.tokenizer.encode(UNK_PHRASE, bos_token=False, eos_token=False)
            spk_ids = [self.speaker_ids("unknown")] * len(tokens)
        elif self.aligned_truncation:
            assert not self.return_spk_ids, "Not supported"
            tokens = tokenize_utterances_word_align(
                utterances, selected, start_time, end_time, self.tokenizer,
                tokenize_speaker=self.tokenizer_speakers,
                speaker_to_id=self.speaker_ids,
            )
            spk_ids = [0] * len(tokens)
        else:
            tokens, spk_ids = tokenize_utterances(
                utterances, selected, self.tokenizer,
                tokenize_speaker=self.tokenizer_speakers,
                speaker_to_id=self.speaker_ids,
                return_spk_ids=True,
            )
            tokens, spk_ids = self._proportional_truncate(
                tokens, spk_ids, selected, start_time, end_time
            )

        tokens = tokens[: self.max_tokens]
        spk_ids = (spk_ids or [0] * len(tokens))[: self.max_tokens]
        assert len(tokens) == len(spk_ids)

        path = os.path.join(self.data_dir, f"{stub}{self.ext}")
        wav = load_audio_segment(path, start_time, end_time, self.sample_rate)
        return wav, np.asarray(tokens, np.int32), np.asarray(spk_ids, np.int32), i

    def _proportional_truncate(self, tokens, spk_ids, selected, start_time, end_time):
        """Truncate boundary-utterance tokens by the out-of-bounds time
        fraction (segment.py:241-281)."""
        start_utt = selected[0][1]
        end_utt = selected[-1][1]
        utt_start = start_utt["utterance_start"]
        utt_end = end_utt["utterance_end"]
        if utt_end - utt_start <= self.segment_size:
            return tokens, spk_ids

        def n_tokens(u):
            return len(self.tokenizer.encode(u["utterance"], bos_token=False,
                                             eos_token=False))

        start_oob = start_time - utt_start
        end_oob = utt_end - end_time
        start_prct = start_oob / max(start_utt["utterance_end"] - utt_start, 1e-9)
        end_prct = end_oob / max(utt_end - end_utt["utterance_start"], 1e-9)
        trunc_start = max(round(start_prct * n_tokens(start_utt)), 0)
        trunc_end = max(round(end_prct * n_tokens(end_utt)), 0)
        stop = len(tokens) - trunc_end
        return tokens[trunc_start:stop], spk_ids[trunc_start:stop]

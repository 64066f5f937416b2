"""Transcript substrate: loading, validity checks, index construction.

Data layout (compatible with the reference corpus format,
tal/asr/data/aligned.py:110-123): a split directory holds
  transcript.pkl     {episode_stub: [utterance dicts]}
  <stub>.wav         the episode audio
  speaker_map.json   lowercased speaker name -> id
Utterance dict keys: utterance, speaker, utterance_start, utterance_end,
role (optional), alignments (optional word-level (start, end, token_ix)).

Index construction mirrors aligned.py:21-73 (sliding windows of
num_utterances consecutive valid utterances with a discontinuity threshold;
the whole episode when num_utterances is None) with a content-addressed
pickle cache, built in parallel across episodes.
"""
from __future__ import annotations

import json
import math
import os
import pickle
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from tal_asrd_tpu.data.audio_io import get_duration

CACHE_VERSION = 1


def is_valid_utterance(utt: dict, file_max_duration: float) -> bool:
    """Bounds checks (data/util.py:55-70 parity)."""
    start, end = utt["utterance_start"], utt["utterance_end"]
    if start > file_max_duration:
        return False
    if end is not None and not (isinstance(end, float) and math.isnan(end)):
        if start > end:
            return False
        if end > file_max_duration:
            return False
    elif start > (end if end is not None else float("inf")):
        return False
    return True


def is_valid_segment(utterances: Sequence[dict], discontinuity_threshold: float = 3.0) -> bool:
    """Adjacent utterances must not be separated by a long gap
    (aligned.py:64-73 parity)."""
    for a, b in zip(utterances, utterances[1:]):
        if b["utterance_start"] - a["utterance_end"] > discontinuity_threshold:
            return False
    return True


def load_transcripts(data_dir: str) -> Dict[str, List[dict]]:
    with open(os.path.join(data_dir, "transcript.pkl"), "rb") as f:
        return pickle.load(f)


def load_speaker_map(path: str) -> Dict[str, int]:
    with open(path) as f:
        return json.load(f)


def episode_index(
    data_dir: str,
    file_stub: str,
    utterances: List[dict],
    num_utterances: Optional[int],
    ext: str,
    discontinuity_threshold: float,
) -> List[Tuple[str, List[dict], float]]:
    """Index one episode: [(stub, segment_utts, duration_s)] (aligned.py:21-61)."""
    audio_file = os.path.join(data_dir, f"{file_stub}{ext}")
    assert os.path.exists(audio_file), audio_file
    f_duration = get_duration(audio_file)

    if num_utterances is None:
        return [(file_stub, utterances, f_duration)]

    valid = [u for u in utterances if is_valid_utterance(u, f_duration)]
    for u in valid:
        end = u["utterance_end"]
        if end is None or (isinstance(end, float) and math.isnan(end)):
            u["utterance_end"] = f_duration

    out = []
    for i in range(len(valid) + 1 - num_utterances):
        seg = valid[i : i + num_utterances]
        if is_valid_segment(seg, discontinuity_threshold):
            dur = sum(u["utterance_end"] - u["utterance_start"] for u in seg)
            out.append((file_stub, seg, dur))
    return out


def build_index(
    data_dir: str,
    num_utterances: Optional[int] = 1,
    ext: str = ".wav",
    discontinuity_threshold: float = 3.0,
    n_jobs: int = 8,
    use_cache: bool = True,
) -> List[Tuple[str, List[dict], float]]:
    """Full-split index with a cache keyed by the args (aligned.py:146-178)."""
    arghash = (num_utterances, ext, discontinuity_threshold, CACHE_VERSION)
    cache_loc = os.path.join(data_dir, f"cache_tpu_aligned_{num_utterances}u.pkl")
    if use_cache and os.path.exists(cache_loc):
        try:
            with open(cache_loc, "rb") as f:
                marker, index = pickle.load(f)
            if marker == arghash:
                return index
        except Exception:
            pass

    transcripts = load_transcripts(data_dir)
    # joblib workers re-import the interpreter (and jax); cap fan-out by the
    # actual core count and by the episode count.
    n_jobs = max(1, min(n_jobs, os.cpu_count() or 1, len(transcripts)))
    try:
        if n_jobs == 1:
            raise ImportError  # sequential path below
        from joblib import Parallel, delayed

        parts = Parallel(n_jobs=n_jobs)(
            delayed(episode_index)(
                data_dir, stub, utts, num_utterances, ext, discontinuity_threshold
            )
            for stub, utts in transcripts.items()
        )
    except ImportError:
        parts = [
            episode_index(data_dir, stub, utts, num_utterances, ext,
                          discontinuity_threshold)
            for stub, utts in transcripts.items()
        ]
    index = [seg for part in parts for seg in part]
    if not index:
        raise ValueError(f"Empty index for {data_dir}")
    if use_cache:
        with open(cache_loc, "wb") as f:
            pickle.dump((arghash, index), f)
    return index


def build_episode_durations(
    data_dir: str, ext: str = ".wav", use_cache: bool = True, n_jobs: int = 8
) -> List[Tuple[str, List[dict], float]]:
    """Segment-dataset substrate: per-episode (stub, valid_utts, duration)
    (segment.py:23-33 parity)."""
    arghash = (ext, CACHE_VERSION)
    cache_loc = os.path.join(data_dir, "cache_tpu_segment.pkl")
    if use_cache and os.path.exists(cache_loc):
        try:
            with open(cache_loc, "rb") as f:
                marker, index = pickle.load(f)
            if marker == arghash:
                return index
        except Exception:
            pass

    transcripts = load_transcripts(data_dir)

    def one(stub, utts):
        path = os.path.join(data_dir, f"{stub}{ext}")
        dur = get_duration(path)
        return stub, [u for u in utts if is_valid_utterance(u, dur)], dur

    index = [one(stub, utts) for stub, utts in transcripts.items()]
    if use_cache:
        with open(cache_loc, "wb") as f:
            pickle.dump((arghash, index), f)
    return index


class SpeakerIds:
    """Speaker-name -> id mapping with the reference's unknown-speaker rule:
    unknown names get the id one past the map (aligned.py:189-194)."""

    def __init__(self, speaker_map: Optional[Dict[str, int]],
                 first_speaker_id: int = 0, tokenizer_speakers: bool = False):
        self.speaker_map = speaker_map or {}
        self.first = first_speaker_id
        self.tokenizer_speakers = tokenizer_speakers

    def __call__(self, name: str) -> int:
        key = name.lower().strip() if isinstance(name, str) else name
        sid = self.speaker_map.get(key, len(self.speaker_map))
        return self.first + sid if self.tokenizer_speakers else sid

"""Batch VAD over a directory of wavs.

Parity target: /root/reference/tal/vad/webrtcvad.py:145-259 — for each wav,
compute speech bounds, write a bounds pickle and (optionally) the
concatenated speech-only wav; skip files whose outputs already exist
(incremental-resume, :153-157); fan out across processes.
"""
from __future__ import annotations

import os
import pickle
from typing import List, Optional, Tuple

import numpy as np

from tal_asrd_tpu.data.audio_io import load_audio_segment, write_wav
from tal_asrd_tpu.vad.core import VadConfig, get_speech_frames, speech_bounds


def run_vad_file(
    audio_path: str,
    out_dir: str,
    cfg: VadConfig = VadConfig(),
    write_speech_wav: bool = True,
) -> Optional[List[Tuple[float, float]]]:
    stub = os.path.splitext(os.path.basename(audio_path))[0]
    bounds_path = os.path.join(out_dir, f"{stub}.bounds.pkl")
    speech_path = os.path.join(out_dir, f"{stub}.speech.wav")
    if os.path.exists(bounds_path) and (
        not write_speech_wav or os.path.exists(speech_path)
    ):
        with open(bounds_path, "rb") as f:  # incremental resume
            return pickle.load(f)

    audio = load_audio_segment(audio_path, 0.0, None, cfg.sample_rate)
    bounds = speech_bounds(audio, cfg)
    os.makedirs(out_dir, exist_ok=True)
    with open(bounds_path, "wb") as f:
        pickle.dump(bounds, f)
    if write_speech_wav:
        speech = get_speech_frames(audio, cfg)
        write_wav(speech_path, speech, cfg.sample_rate)
    return bounds


def run_vad_directory(
    data_dir: str,
    out_dir: str,
    cfg: VadConfig = VadConfig(),
    ext: str = ".wav",
    workers: int = 4,
    write_speech_wav: bool = True,
):
    files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir) if f.endswith(ext)
    )
    if workers > 1:
        from joblib import Parallel, delayed

        return dict(zip(
            files,
            Parallel(n_jobs=workers)(
                delayed(run_vad_file)(f, out_dir, cfg, write_speech_wav)
                for f in files
            ),
        ))
    return {f: run_vad_file(f, out_dir, cfg, write_speech_wav) for f in files}

"""Host-side audio IO: wav probing, seek-loading, resampling.

Replaces the reference's torchaudio/sox stack (/root/reference/tal/asr/data/
util.py:18-53 `load_audio_segment`, tal/utils/audio.py:89-159 wav probing)
with stdlib `wave` + numpy + scipy polyphase resampling — no external sox or
ffmpeg needed for PCM wav. Non-wav containers (mp3 etc.) still require an
external `ffmpeg` binary; `convert_audio` shells out when one is present
(tal/utils/audio.py:38-87 parity) and raises otherwise.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import wave
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

DEFAULT_SR = 16000


@dataclass
class AudioInfo:
    sample_rate: int
    num_frames: int
    num_channels: int
    sample_width: int

    @property
    def duration(self) -> float:
        return self.num_frames / self.sample_rate


def get_audio_info(path: str) -> AudioInfo:
    """Probe a wav header (tal/utils/audio.py:89-159 analog)."""
    with wave.open(path, "rb") as w:
        return AudioInfo(
            sample_rate=w.getframerate(),
            num_frames=w.getnframes(),
            num_channels=w.getnchannels(),
            sample_width=w.getsampwidth(),
        )


def get_duration(path: str) -> float:
    return get_audio_info(path).duration


def _pcm_to_float(raw: bytes, sample_width: int, num_channels: int) -> np.ndarray:
    if sample_width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sample_width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif sample_width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"Unsupported sample width {sample_width}")
    if num_channels > 1:
        x = x.reshape(-1, num_channels).mean(axis=1)
    return x


def resample(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resampling (torchaudio.transforms.Resample analog)."""
    if orig_sr == new_sr:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(orig_sr, new_sr)
    return resample_poly(x, new_sr // g, orig_sr // g).astype(np.float32)


def load_audio_segment(
    path: str,
    start_s: float = 0.0,
    end_s: Optional[float] = None,
    target_sr: int = DEFAULT_SR,
) -> np.ndarray:
    """Seek-load [start_s, end_s) of a wav, mono float32 at target_sr
    (data/util.py:18-53 analog; values normalized to [-1, 1])."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        total = w.getnframes()
        start = int(start_s * sr)
        end = total if end_s is None else min(int(end_s * sr), total)
        start = min(start, total)
        w.setpos(start)
        raw = w.readframes(max(end - start, 0))
    x = _pcm_to_float(raw, width, nch)
    return resample(x, sr, target_sr)


def write_wav(path: str, x: np.ndarray, sr: int = DEFAULT_SR) -> None:
    x16 = np.clip(x * 32768.0, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x16.tobytes())


def convert_audio(src: str, dst: str, sr: int = DEFAULT_SR) -> str:
    """Convert any container to mono 16 kHz 16-bit wav via ffmpeg when
    available (tal/utils/audio.py:38-87 analog)."""
    if src.lower().endswith(".wav"):
        x = load_audio_segment(src, 0.0, None, sr)
        write_wav(dst, x, sr)
        return dst
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(f"ffmpeg not available to convert {src}")
    subprocess.run(
        [ffmpeg, "-y", "-i", src, "-ac", "1", "-ar", str(sr),
         "-acodec", "pcm_s16le", dst],
        check=True, capture_output=True,
    )
    return dst

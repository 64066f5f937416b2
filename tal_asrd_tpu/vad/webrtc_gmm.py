"""Host-side GMM VAD (native/webrtc_vad.cpp): the exact-parity path.

The reference's per-frame decision comes from the webrtcvad C++ package
(/root/reference/tal/asr/speech_detect.py:5-6, tal/vad/webrtcvad.py:7); the
XLA energy VAD (vad/core.py) is this framework's fast batched default. This
wrapper exposes the native GMM detector with webrtcvad's interface:

    vad = WebRtcGmmVad(mode=3)
    vad.is_speech(frame_bytes, sample_rate)   # 10/20/30 ms int16 PCM frames

and a convenience `decisions(audio_f32, cfg)` matching vad/core.py's
speech_decisions signature, so the trigger collector / pipeline can swap
detectors with one flag (VadConfig-compatible)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libwebrtcvad.so")
_lib = None
_lock = threading.Lock()


def _load():
    global _lib
    if os.environ.get("TAL_ASRD_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "webrtc_vad.cpp")
        if not os.path.exists(_SO_PATH) and os.path.exists(src):
            os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, src],
                    check=True, capture_output=True,
                )
            except Exception:
                return None
        if not os.path.exists(_SO_PATH):
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.vad_create.restype = ctypes.c_void_p
        lib.vad_free.argtypes = [ctypes.c_void_p]
        lib.vad_set_mode.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.vad_set_mode.restype = ctypes.c_int
        lib.vad_process.restype = ctypes.c_int
        lib.vad_process.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int16), ctypes.c_size_t,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class WebRtcGmmVad:
    """webrtcvad.Vad-compatible stateful detector."""

    def __init__(self, mode: int = 3):
        lib = _load()
        if lib is None:
            raise RuntimeError("native webrtc_vad unavailable (no g++?)")
        self._lib = lib
        self._inst = lib.vad_create()
        assert lib.vad_set_mode(self._inst, mode) == 0, f"bad mode {mode}"

    def __del__(self):
        try:
            self._lib.vad_free(self._inst)
        except Exception:
            pass

    def set_mode(self, mode: int) -> None:
        assert self._lib.vad_set_mode(self._inst, mode) == 0

    def is_speech(self, frame: bytes, sample_rate: int) -> bool:
        """frame: int16 little-endian PCM of 10/20/30 ms."""
        buf = np.frombuffer(frame, np.int16)
        r = self._lib.vad_process(
            self._inst, sample_rate,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(buf),
        )
        assert r >= 0, f"invalid frame (len {len(buf)} @ {sample_rate})"
        return bool(r)


def decisions(audio: np.ndarray, sample_rate: int = 16000,
              frame_duration_ms: int = 30, mode: int = 3) -> np.ndarray:
    """float32 [-1,1] audio -> bool per-frame decisions (GMM path), same
    framing as vad/core.py speech_decisions."""
    vad = WebRtcGmmVad(mode)
    n = int(sample_rate * frame_duration_ms / 1000)
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype(np.int16)
    out = []
    for i in range(0, len(pcm) - n + 1, n):
        out.append(vad.is_speech(pcm[i:i + n].tobytes(), sample_rate))
    return np.asarray(out, bool)

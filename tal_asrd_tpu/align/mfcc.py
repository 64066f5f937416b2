"""MFCC features (log-mel -> DCT-II), for audio-to-audio DTW alignment.

The aeneas aligner DTWs MFCCs of real audio against MFCCs of synthesized
speech (tal/alignment/aeneas.py). MFCCs here reuse the framework's fused
log-mel frontend and apply an orthonormal DCT-II over the mel axis — one
extra MXU matmul.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig
from tal_asrd_tpu.ops.logmel import log_mel_spectrogram


@functools.lru_cache(maxsize=4)
def dct_matrix(n_mels: int, n_mfcc: int) -> np.ndarray:
    """Orthonormal DCT-II basis [n_mels, n_mfcc]."""
    k = np.arange(n_mfcc)[None, :]
    n = np.arange(n_mels)[:, None]
    basis = np.cos(np.pi / n_mels * (n + 0.5) * k)
    basis *= np.sqrt(2.0 / n_mels)
    basis[:, 0] = 1.0 / np.sqrt(n_mels)
    return basis.astype(np.float32)


def mfcc(audio: jax.Array, cfg: FrontendConfig = FrontendConfig(),
         n_mfcc: int = 13) -> jax.Array:
    """[B, T] audio -> [B, frames, n_mfcc]."""
    mel = log_mel_spectrogram(audio, cfg, mean_subtract=False)
    basis = jnp.asarray(dct_matrix(cfg.n_mels, n_mfcc))
    return mel @ basis

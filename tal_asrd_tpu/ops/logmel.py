"""Log-mel spectrogram frontend as one fused XLA computation.

Parity target: the torchaudio MelSpectrogram used by the reference
(/root/reference/tal/asr/models.py:15-53): 16 kHz, 80 mels, n_fft=400,
win_length=400 (25 ms Hann), hop=160 (10 ms), power=2.0, center=True with
reflect padding, HTK mel scale, no filterbank normalization, then
log(mel + 1e-6) and subtraction of the global mean (models.py:50-52).

TPU mapping:
  * framing is a static gather (no dynamic shapes), windowing fuses into it;
  * the FFT runs as XLA's batched rFFT;
  * the mel projection is a [*, n_freqs] x [n_freqs, n_mels] matmul on the MXU;
  * everything lives in one jit so XLA fuses window/power/log elementwise ops.

The audio (and output) stay float32 — the frontend is precision-critical for
WER parity; the model casts to bfloat16 downstream.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    n_freqs: int,
    f_min: float,
    f_max: float,
    n_mels: int,
    sample_rate: int,
) -> np.ndarray:
    """Triangular HTK-mel filterbank, [n_freqs, n_mels], float32.

    Matches torchaudio's create_fb_matrix with htk scaling and norm=None
    (the behavior behind models.py:24-32): FFT bin centers are
    linspace(0, sr/2, n_freqs); mel points are linspace in HTK-mel space.
    """
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_min = _hz_to_mel_htk(f_min)
    m_max = _hz_to_mel_htk(f_max)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)

    f_diff = f_pts[1:] - f_pts[:-1]                    # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]       # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[:-1]               # rising edge
    up = slopes[:, 2:] / f_diff[1:]                    # falling edge
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def num_frames(n_samples: int, cfg: FrontendConfig) -> int:
    """Output frame count. center=True gives 1 + n_samples // hop."""
    if cfg.center:
        return 1 + n_samples // cfg.hop_length
    return 1 + (n_samples - cfg.n_fft) // cfg.hop_length


def _hann_periodic(win_length: int) -> np.ndarray:
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(np.float32)


def frame_signal(audio: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """[B, T] -> [B, n_frames, win_length] with center reflect padding."""
    if cfg.center:
        pad = cfg.n_fft // 2
        audio = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    t = audio.shape[-1]
    n_f = 1 + (t - cfg.n_fft) // cfg.hop_length
    # Static index grid: XLA lowers this gather to an efficient windowed copy.
    idx = (
        np.arange(n_f, dtype=np.int32)[:, None] * cfg.hop_length
        + np.arange(cfg.win_length, dtype=np.int32)[None, :]
    )
    return audio[:, idx]


# Spectrum lowering for impl="auto", per backend. XLA's TPU FFT is the
# classic frontend trap (no FFT unit; n_fft=400 is not even a power of two),
# while a 400->201 DFT is two small MXU matmuls. TPU default flipped to
# "dft" on silicon evidence (ENC_MICROBENCH.json, 2026-08-18, dispatch-
# corrected scan x16 at B=32: dft 18.27 ms vs fft 23.85 ms — a 23% frontend
# win; parity pinned to 1e-4 by tests/test_frontend.py vs both the rfft
# path and the torch golden fixture). CPU keeps rfft (pocketfft beats the
# O(N^2) matmuls on a scalar core).
AUTO_SPECTRUM = {"tpu": "dft", "cpu": "fft", "gpu": "fft"}


@functools.lru_cache(maxsize=4)
def dft_matrices(n_fft: int, win_length: int):
    """Hann-windowed real-DFT matrices [win_length, n_fft//2+1], float32.

    power = (frames @ cos)^2 + (frames @ sin)^2 == |rfft(frames * hann)|^2
    — the 25 ms window is folded into the constant matrices, so the whole
    windowed transform is two matmuls on the MXU (f32: the frontend is
    precision-critical for WER parity; see module docstring)."""
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w = _hann_periodic(win_length).astype(np.float64)[:, None]
    return (np.cos(ang) * w).astype(np.float32), \
           (np.sin(ang) * w).astype(np.float32)


def power_spectrogram(audio: jax.Array, cfg: FrontendConfig) -> jax.Array:
    """[B, T] -> [B, n_frames, n_fft//2 + 1] power spectrum (|rfft|^2)."""
    frames = frame_signal(audio, cfg)
    impl = getattr(cfg, "spectrum_impl", "auto")
    if impl == "auto":
        impl = AUTO_SPECTRUM.get(jax.default_backend(), "fft")
    if impl == "dft":
        cosm, sinm = dft_matrices(cfg.n_fft, cfg.win_length)
        frames = frames.astype(jnp.float32)
        re = frames @ jnp.asarray(cosm)
        im = frames @ jnp.asarray(sinm)
        return re ** 2 + im ** 2
    window = jnp.asarray(_hann_periodic(cfg.win_length))
    frames = frames * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=cfg.n_fft, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def log_mel_spectrogram(
    audio: jax.Array,
    cfg: FrontendConfig = FrontendConfig(),
    mean_subtract: bool | None = None,
    audio_lens: jax.Array | None = None,
) -> jax.Array:
    """Raw waveform [B, T] (float32 in [-1, 1]) -> log-mel [B, n_frames, n_mels].

    Equivalent of LogMelSpec.forward (models.py:36-53): global scalar mean
    subtraction over the batch. With `audio_lens=None` the mean includes
    padding frames — exactly the reference's quirk on its right-padded
    batches (bit-identical when there is no padding). With `audio_lens`, the
    mean is taken over REAL frames only: under bucketed collation the padded
    mean shifts every feature by log_eps-floor x the batch's padding
    fraction, so identical audio lands in different feature regimes
    depending on bucket occupancy (measured: the same utterances score CE
    0.99 in a tight bucket vs 3.17 re-collated into a 30 s bucket, and
    mixed-bucket training collapses toward the LM prior). The masked mean is
    the bucket-safe equivalent, same spirit as pad_mask_mode='buffer'.
    """
    if audio.ndim == 1:
        audio = audio[None]
    spec = power_spectrogram(audio, cfg)  # [B, F, n_freqs]
    fb = jnp.asarray(
        mel_filterbank(
            cfg.n_fft // 2 + 1, cfg.f_min, cfg.effective_f_max, cfg.n_mels, cfg.sample_rate
        )
    )
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from tal_asrd_tpu.ops.pallas_kernels import fused_logmel_project

        b, f, nf = spec.shape
        mel = fused_logmel_project(
            spec.reshape(b * f, nf), fb, eps=cfg.log_eps, interpret=False
        ).reshape(b, f, cfg.n_mels)
    else:
        mel = spec @ fb  # MXU matmul: [B, F, n_freqs] x [n_freqs, n_mels]
        mel = jnp.log(mel + cfg.log_eps)
    do_mean = cfg.mean_subtract if mean_subtract is None else mean_subtract
    if do_mean:
        if audio_lens is None:
            mel = mel - jnp.mean(mel)
        else:
            # Real frames of item i: centers at k*hop for k <= len_i // hop
            # (center=True reflect pad keeps frame k anchored at sample k*hop).
            n_frames = mel.shape[1]
            frame_idx = jnp.arange(n_frames)[None, :]
            real = frame_idx <= (audio_lens[:, None] // cfg.hop_length)
            denom = jnp.maximum(real.sum(), 1) * mel.shape[-1]
            mean = jnp.sum(mel * real[..., None], dtype=jnp.float32) / denom
            mel = mel - mean.astype(mel.dtype)
    return mel

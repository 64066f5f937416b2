"""Trainable neural speech-activity detection (the pyannote-SAD equivalent).

Parity target: /root/reference/tal/vad/__init__.py:195-258 — the reference
scores episodes with pyannote's pretrained `sad_ami` PyanNet (SincNet
learnable band-pass frontend -> BiLSTM -> FF -> per-frame speech score) and
binarizes at onset/offset 0.52 with 0.1 s min on/off durations. pyannote and
its pretrained weights cannot enter this environment, so the capability is
reproduced natively: the same architecture family in flax, trainable on any
corpus whose transcripts carry utterance bounds (cli.sad), scored through the
same Binarize semantics (vad/sad.py) and frame-level evaluator (vad/eval.py).

TPU notes: the SincConv filterbank is materialized from (low, band)
parameters inside the traced graph each forward — static shapes, one
`lax.conv_general_dilated` that XLA tiles onto the MXU; the BiLSTM runs as
two `lax.scan`s (flax nn.RNN) over ~59 fps frame sequences, which is tiny
next to the frontend conv. All pooling is `nn.max_pool` with static windows.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

SAMPLE_RATE = 16000
# SincNet stride 10 then three maxpool(3): 270-sample frame hop (16.875 ms),
# the pyannote PyanNet decimation chain.
FRAME_HOP = 270


def _mel_spaced_bands(n: int, sr: int, min_low: float, min_band: float):
    """Initial (low, band) cutoffs mel-spaced over [30 Hz, sr/2], the SincNet
    initialization scheme."""
    to_mel = lambda hz: 2595.0 * np.log10(1.0 + hz / 700.0)
    to_hz = lambda mel: 700.0 * (10.0 ** (mel / 2595.0) - 1.0)
    edges = to_hz(np.linspace(to_mel(30.0), to_mel(sr / 2 - 100.0), n + 1))
    low = edges[:-1]
    band = np.diff(edges)
    return (np.maximum(low - min_low, 0.0).astype(np.float32),
            np.maximum(band - min_band, 0.0).astype(np.float32))


class SincConv(nn.Module):
    """Learnable band-pass filterbank over raw waveform (SincNet conv).

    Filters are an explicit function of per-channel (low, band) cutoff
    parameters, rebuilt inside the graph every forward — 2*out_channels
    trainable scalars instead of out_channels*kernel free weights.
    """
    out_channels: int = 80
    kernel_size: int = 251  # odd: symmetric filters
    stride: int = 10
    sample_rate: int = SAMPLE_RATE
    min_low_hz: float = 50.0
    min_band_hz: float = 50.0

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        """[B, T] -> [B, T//stride, out_channels]."""
        low0, band0 = _mel_spaced_bands(
            self.out_channels, self.sample_rate, self.min_low_hz,
            self.min_band_hz)
        low_hz = self.param("low_hz", lambda _: jnp.asarray(low0))
        band_hz = self.param("band_hz", lambda _: jnp.asarray(band0))

        low = self.min_low_hz + jnp.abs(low_hz)                      # [C]
        high = jnp.clip(low + self.min_band_hz + jnp.abs(band_hz),
                        self.min_low_hz, self.sample_rate / 2.0)     # [C]

        half = (self.kernel_size - 1) // 2
        # time axis of the left half (right half is mirrored)
        t = jnp.arange(-half, 0, dtype=jnp.float32) / self.sample_rate  # [K/2]
        # Half-Hamming rising monotonically toward the filter center: the
        # cosine argument sweeps 0..pi over the LEFT half (SincNet's
        # linspace(0, K/2-1, half) convention). Sweeping a full period here
        # (ADVICE r3) peaked the window mid-half and collapsed it to 0.08 at
        # the center tap, attenuating the sinc mainlobe.
        window = 0.54 - 0.46 * jnp.cos(
            2.0 * jnp.pi
            * jnp.linspace(0.0, float(self.kernel_size) / 2.0 - 1.0,
                           half, dtype=jnp.float32)
            / self.kernel_size)                                      # [K/2]
        # band-pass = high-lowpass minus low-lowpass, Hamming-windowed
        arg = 2.0 * jnp.pi * t[None, :]                              # [1, K/2]
        left = ((jnp.sin(high[:, None] * arg) - jnp.sin(low[:, None] * arg))
                / (arg / 2.0)) * window[None, :]                     # [C, K/2]
        center = 2.0 * (high - low)[:, None]                         # [C, 1]
        filters = jnp.concatenate(
            [left, center, left[:, ::-1]], axis=1)                   # [C, K]
        filters = filters / (2.0 * (high - low)[:, None])            # unit gain

        out = jax.lax.conv_general_dilated(
            wav[:, :, None], filters.T[:, None, :],                  # [K,1,C]
            window_strides=(self.stride,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out


class PyanNet(nn.Module):
    """SincNet frontend -> conv stack -> BiLSTM -> FF -> per-frame logit.

    The pyannote `sad_ami` architecture family (SincNet {80ch, stride 10},
    two conv(60, k=5) blocks, 2x BiLSTM(128), 2x FF(128), sigmoid head).
    Returns LOGITS [B, T_frames]; apply sigmoid for scores.
    """
    lstm_hidden: int = 128
    ff_hidden: int = 128
    conv_channels: int = 60
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        x = SincConv()(wav.astype(jnp.float32))                    # [B,T/10,80]
        x = jnp.abs(x)
        x = nn.max_pool(x, (3,), strides=(3,))
        x = nn.LayerNorm()(x)
        for _ in range(2):
            x = nn.Conv(self.conv_channels, (5,), padding="SAME",
                        dtype=self.dtype)(x)
            x = nn.leaky_relu(x)
            x = nn.max_pool(x, (3,), strides=(3,))
            x = nn.LayerNorm()(x)
        for _ in range(2):
            x = nn.Bidirectional(
                nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden)),
                nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden)),
            )(x)                                                   # [B,F,256]
        for _ in range(2):
            x = nn.leaky_relu(nn.Dense(self.ff_hidden, dtype=self.dtype)(x))
        return nn.Dense(1)(x.astype(jnp.float32))[..., 0]          # [B,F]


def n_frames(n_samples: int) -> int:
    """Output frames for an input of n_samples (SAME conv, floor pooling)."""
    f = -(-n_samples // 10)  # ceil: stride-10 SAME conv
    for _ in range(3):
        f = f // 3
    return f


def frame_labels(bounds, n_samples: int, sample_rate: int = SAMPLE_RATE,
                 offset_s: float = 0.0) -> np.ndarray:
    """Per-output-frame speech labels from (start_s, end_s) utterance bounds.

    Frame i covers samples [i*270, (i+1)*270); labeled speech when its center
    falls inside any bound (shifted by offset_s for windowed training).
    """
    f = n_frames(n_samples)
    centers = offset_s + (np.arange(f) + 0.5) * FRAME_HOP / sample_rate
    lab = np.zeros(f, np.float32)
    for s, e in bounds:
        lab[(centers >= s) & (centers < e)] = 1.0
    return lab


def score_episode(params, wav: np.ndarray, window_s: float = 2.0,
                  batch: int = 16, model: Optional[PyanNet] = None
                  ) -> np.ndarray:
    """Frame speech probabilities for a full episode.

    Non-overlapping windows, batched (static shapes — one compiled graph for
    every window, tail zero-padded and truncated after scoring). The window
    is snapped to a multiple of FRAME_HOP so window-local frames land exactly
    on the global 270-sample grid (otherwise each window drifts 140 samples
    and boundaries smear by ~0.5 s per minute of audio).
    """
    model = model or PyanNet()
    win = FRAME_HOP * max(1, round(window_s * SAMPLE_RATE / FRAME_HOP))
    total = len(wav)
    n_win = -(-total // win)
    padded = np.zeros(n_win * win, np.float32)
    padded[:total] = wav
    windows = padded.reshape(n_win, win)
    fw = n_frames(win)

    @jax.jit
    def run(w):
        return jax.nn.sigmoid(model.apply({"params": params}, w))

    out = []
    for i in range(0, n_win, batch):
        chunk = windows[i:i + batch]
        if len(chunk) < batch:  # pad the last batch to the compiled shape
            chunk = np.concatenate(
                [chunk, np.zeros((batch - len(chunk), win), np.float32)])
        out.append(np.asarray(run(jnp.asarray(chunk))))
    scores = np.concatenate(out)[:n_win, :fw].reshape(-1)
    return scores[: n_frames(total)]

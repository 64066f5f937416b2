"""Frontend parity tests.

The reference validates nothing here (no tests upstream); WER parity dies first
at the frontend, so we golden-test the STFT against torch.stft (same center /
reflect / Hann / power semantics the reference's torchaudio MelSpectrogram
uses, /root/reference/tal/asr/models.py:24-32) and the HTK mel filterbank
against an independent construction.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig, SpecAugmentConfig

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")
from tal_asrd_tpu.ops.logmel import (
    log_mel_spectrogram,
    mel_filterbank,
    num_frames,
    power_spectrogram,
)
from tal_asrd_tpu.ops.specaug import spec_augment
from tal_asrd_tpu.ops.ngram import ngram_repeat_mask

CFG = FrontendConfig()


def test_num_frames():
    # 1 s of 16 kHz audio with center=True -> 101 frames of 10 ms
    assert num_frames(16000, CFG) == 101
    assert num_frames(16000 * 20, CFG) == 2001


def test_power_spectrogram_matches_torch_stft_golden():
    """Always-on parity vs a committed torch.stft golden fixture
    (tests/fixtures/stft_golden.npz, generated from torch 2.13 CPU with
    torchaudio MelSpectrogram's STFT options: Hann periodic window, center
    reflect-pad, onesided, power 2 — tal/asr/models.py:24-32)."""
    fix = np.load(os.path.join(FIXTURES, "stft_golden.npz"))
    assert tuple(fix["meta"]) == (CFG.n_fft, CFG.hop_length, CFG.win_length)
    ours = np.asarray(power_spectrogram(jnp.asarray(fix["audio"]), CFG))
    assert ours.shape == fix["ref_power"].shape
    np.testing.assert_allclose(ours, fix["ref_power"], rtol=1e-4, atol=1e-5)


def test_logmel_matches_torchaudio_golden():
    """Full frontend (pre mean-sub) vs the committed torchaudio-composition
    golden: HTK mel filterbank @ power spectrum, log(mel + 1e-6)."""
    fix = np.load(os.path.join(FIXTURES, "logmel_golden.npz"))
    cfg = FrontendConfig(mean_subtract=False)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(fix["audio"]), cfg))
    np.testing.assert_allclose(ours, fix["logmel"], rtol=1e-4, atol=1e-4)


def test_power_spectrogram_matches_torch_stft_live():
    """Re-derives the golden from the locally installed torch when present
    (guards against fixture staleness)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 16000).astype(np.float32) * 0.1

    ours = np.asarray(power_spectrogram(jnp.asarray(audio), CFG))

    window = torch.hann_window(CFG.win_length, periodic=True)
    ref = torch.stft(
        torch.from_numpy(audio),
        n_fft=CFG.n_fft,
        hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=window,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    ref_power = (ref.real**2 + ref.imag**2).numpy().transpose(0, 2, 1)  # [B, T, F]

    assert ours.shape == ref_power.shape
    np.testing.assert_allclose(ours, ref_power, rtol=1e-4, atol=1e-5)


def test_mel_filterbank_properties():
    fb = mel_filterbank(201, 0.0, 8000.0, 80, 16000)
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    # Triangles: each filter has a single contiguous support and unit-ish peak
    peaks = fb.max(axis=0)
    assert (peaks > 0).all()
    assert (peaks <= 1.0 + 1e-6).all()
    # Filter centers strictly increase in frequency
    centers = fb.argmax(axis=0)
    assert (np.diff(centers) >= 0).all()


def test_mel_filterbank_htk_edges():
    # Independent check of HTK mel spacing: the k-th filter peaks where
    # bin frequency is closest to mel_to_hz(mel points).
    fb = mel_filterbank(201, 0.0, 8000.0, 80, 16000)
    m_pts = np.linspace(0.0, 2595.0 * np.log10(1 + 8000.0 / 700.0), 82)
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    freqs = np.linspace(0, 8000.0, 201)
    expected_centers = np.array([np.abs(freqs - f).argmin() for f in f_pts[1:-1]])
    observed_centers = fb.argmax(axis=0)
    assert np.abs(expected_centers - observed_centers).max() <= 1


def test_log_mel_shape_and_mean_subtraction():
    rng = np.random.RandomState(1)
    audio = rng.randn(3, 32000).astype(np.float32) * 0.05
    mel = np.asarray(log_mel_spectrogram(jnp.asarray(audio), CFG))
    assert mel.shape == (3, 201, 80)
    # Global mean subtraction: mean over the whole tensor ~ 0
    assert abs(mel.mean()) < 1e-4
    # Without mean subtraction values are log(power + 1e-6), lower-bounded
    mel_raw = np.asarray(
        log_mel_spectrogram(jnp.asarray(audio), CFG, mean_subtract=False)
    )
    assert mel_raw.min() >= np.log(1e-6) - 1e-5


def test_log_mel_masked_mean_bucket_invariant():
    """With audio_lens, the feature values of REAL frames must not depend on
    how much bucket padding follows (the round-3 poison: padded-batch scalar
    mean shifted identical audio by the padding fraction; measured CE 0.99
    -> 3.17 re-collating the same utterances into a 30 s bucket)."""
    rng = np.random.RandomState(2)
    wav = rng.randn(2, 24000).astype(np.float32) * 0.05
    lens = jnp.asarray([24000, 16000])
    tight = np.zeros((2, 32000), np.float32)
    tight[0, :24000], tight[1, :16000] = wav[0], wav[1, :16000]
    loose = np.zeros((2, 96000), np.float32)
    loose[0, :24000], loose[1, :16000] = wav[0], wav[1, :16000]
    mt = np.asarray(log_mel_spectrogram(jnp.asarray(tight), CFG, audio_lens=lens))
    ml = np.asarray(log_mel_spectrogram(jnp.asarray(loose), CFG, audio_lens=lens))
    n_real = 24000 // CFG.hop_length + 1
    np.testing.assert_allclose(mt[0, :n_real], ml[0, :n_real], atol=2e-5)
    # Padded-mode (no lens) must NOT be invariant — that is the reference
    # quirk the masked mode exists to neutralize under bucketing.
    pt = np.asarray(log_mel_spectrogram(jnp.asarray(tight), CFG))
    pl_ = np.asarray(log_mel_spectrogram(jnp.asarray(loose), CFG))
    assert abs(float(pt[0, 0].mean() - pl_[0, 0].mean())) > 0.5


def test_log_mel_masked_mean_matches_padded_when_full():
    """No padding => masked mean is bit-identical to the reference path."""
    rng = np.random.RandomState(3)
    audio = rng.randn(2, 32000).astype(np.float32) * 0.05
    lens = jnp.asarray([32000, 32000])
    a = np.asarray(log_mel_spectrogram(jnp.asarray(audio), CFG))
    b = np.asarray(log_mel_spectrogram(jnp.asarray(audio), CFG, audio_lens=lens))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_log_mel_jit_and_grad_safe():
    # The frontend must be traceable (static shapes) and non-NaN on silence.
    f = jax.jit(lambda a: log_mel_spectrogram(a, CFG))
    out = f(jnp.zeros((1, 16000), jnp.float32))
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# SpecAugment
# ---------------------------------------------------------------------------

def test_spec_augment_masks_zero_and_bounded():
    key = jax.random.PRNGKey(0)
    spec = jnp.ones((4, 300, 80), jnp.float32)
    cfg = SpecAugmentConfig()
    out = np.asarray(spec_augment(key, spec, cfg))
    assert out.shape == spec.shape
    # Masked elements are exactly zero; unmasked untouched.
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # Each example: masked freq columns <= 2*(F-1), time rows <= 2*(T-1)
    for b in range(4):
        zero_cols = np.all(out[b] == 0, axis=0).sum()
        zero_rows = np.all(out[b] == 0, axis=1).sum()
        assert zero_cols <= 2 * (cfg.freq_mask_param - 1)
        assert zero_rows <= 2 * (cfg.time_mask_param - 1)


def test_spec_augment_randomness_and_determinism():
    spec = jnp.ones((2, 200, 80), jnp.float32)
    a = np.asarray(spec_augment(jax.random.PRNGKey(0), spec))
    b = np.asarray(spec_augment(jax.random.PRNGKey(0), spec))
    c = np.asarray(spec_augment(jax.random.PRNGKey(1), spec))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


# ---------------------------------------------------------------------------
# N-gram repetition mask (vs direct Python port of util.py:5-17 semantics)
# ---------------------------------------------------------------------------

def _ngram_repeat_mask_ref(xs, n):
    mask = np.zeros_like(xs)
    for i, x in enumerate(xs):
        seen = set()
        xl = list(x)
        for j in range(len(x) - n):
            ng = tuple(xl[j : j + n])
            if ng in seen:
                mask[i, j : j + n] = 1
            seen.add(ng)
    return mask


@pytest.mark.parametrize("n", [2, 3, 5])
def test_ngram_repeat_mask_matches_reference(n):
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 5, size=(4, 40))
    ours = np.asarray(ngram_repeat_mask(jnp.asarray(xs), n))
    ref = _ngram_repeat_mask_ref(xs, n)
    np.testing.assert_array_equal(ours, ref)


def test_ngram_repeat_mask_valid_len():
    xs = np.array([[1, 2, 1, 2, 1, 2, 0, 0]])
    # With full length, the trailing zeros create spurious repeats; with
    # valid_len=6 only the 1,2 repetition inside the valid region is flagged.
    m = np.asarray(ngram_repeat_mask(jnp.asarray(xs), 2, jnp.asarray([6])))
    assert m[0, 6:].sum() == 0
    assert m[0, 2:6].sum() > 0


def test_dft_spectrum_matches_fft_and_golden():
    """spectrum_impl='dft' (windowed DFT as two f32 MXU matmuls,
    ops/logmel.py dft_matrices) must match both the rfft path and the
    committed torch.stft golden — it is the TPU lowering of the SAME
    transform, not an approximation."""
    from dataclasses import replace

    fix = np.load(os.path.join(FIXTURES, "stft_golden.npz"))
    audio = jnp.asarray(fix["audio"])
    p_fft = np.asarray(power_spectrogram(audio, replace(CFG, spectrum_impl="fft")))
    p_dft = np.asarray(power_spectrogram(audio, replace(CFG, spectrum_impl="dft")))
    np.testing.assert_allclose(p_dft, p_fft, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(p_dft, fix["ref_power"], rtol=1e-4, atol=1e-5)

    # full log-mel parity between impls on random audio
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.3)
    cfg_f = replace(CFG, spectrum_impl="fft")
    cfg_d = replace(CFG, spectrum_impl="dft")
    m_f = np.asarray(log_mel_spectrogram(x, cfg_f))
    m_d = np.asarray(log_mel_spectrogram(x, cfg_d))
    np.testing.assert_allclose(m_d, m_f, rtol=2e-4, atol=2e-4)

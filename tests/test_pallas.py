"""Pallas kernel tests (interpreter mode on CPU): the fused log-mel
projection must match the XLA frontend bit-for-bit; the PRNG SpecAugment
kernel must produce valid, deterministic-per-seed masks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tal_asrd_tpu.core.config import FrontendConfig
from tal_asrd_tpu.ops.logmel import mel_filterbank, power_spectrogram
from tal_asrd_tpu.ops.pallas_kernels import fused_logmel_project, specaug_pallas

CFG = FrontendConfig()


def test_fused_logmel_matches_xla():
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    power = power_spectrogram(audio, CFG)      # [B, F, 201]
    b, f, nf = power.shape
    fb = jnp.asarray(mel_filterbank(nf, 0.0, 8000.0, 80, 16000))

    ref = jnp.log(power.reshape(-1, nf) @ fb + 1e-6)
    got = fused_logmel_project(power.reshape(-1, nf), fb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_fused_logmel_ragged_rows():
    # N not a multiple of the block: padding must not leak into outputs
    rng = np.random.RandomState(1)
    power = jnp.asarray(np.abs(rng.randn(37, 201)).astype(np.float32))
    fb = jnp.asarray(mel_filterbank(201, 0.0, 8000.0, 80, 16000))
    got = fused_logmel_project(power, fb, interpret=True)
    ref = jnp.log(power @ fb + 1e-6)
    assert got.shape == (37, 80)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="TPU PRNG primitives have no CPU interpret rule")
def test_specaug_pallas_masks():
    spec = jnp.ones((3, 64, 80), jnp.float32)
    seeds = jnp.asarray([1, 2, 3], jnp.int32)
    out = np.asarray(specaug_pallas(seeds, spec, freq_mask_param=10,
                                    time_mask_param=20, interpret=False))
    assert out.shape == (3, 64, 80)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # deterministic per seed
    out2 = np.asarray(specaug_pallas(seeds, spec, freq_mask_param=10,
                                     time_mask_param=20, interpret=False))
    np.testing.assert_array_equal(out, out2)
    # different seeds -> different masks (across batch slots)
    assert not np.array_equal(out[0], out[1]) or not np.array_equal(out[1], out[2])
    # masked spans are bounded by the params
    for b in range(3):
        zero_cols = np.all(out[b] == 0, axis=0).sum()
        zero_rows = np.all(out[b] == 0, axis=1).sum()
        assert zero_cols <= 2 * 10
        assert zero_rows <= 2 * 20

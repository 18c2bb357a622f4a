"""MXU matmul FFT vs numpy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from gnss_sdr_tpu.ops import fft as mfft


@pytest.mark.parametrize("n", [64, 500, 2000, 4000, 4096, 8192, 16000])
def test_fft_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    y = np.asarray(mfft.fft(jnp.asarray(x)))
    ref = np.fft.fft(x)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5
    xi = np.asarray(mfft.ifft(jnp.asarray(y)))
    assert np.abs(xi - x).max() < 1e-4 * np.abs(x).max() + 1e-4


def test_fft_batched():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 7, 512))
         + 1j * rng.standard_normal((4, 7, 512))).astype(np.complex64)
    y = np.asarray(mfft.fft(jnp.asarray(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-5


def test_split_factors_bounded():
    for n in (1000, 2046, 4092, 10230, 20460, 65536):
        n1, n2 = mfft._split(n)
        assert n1 * n2 == n
        assert max(n1, n2) <= 512 or n in ()


def test_friendly_len_properties():
    """friendly_len returns a nearby >=n length whose _split factors are
    both <= 512 (no dense-DFT fallback), for awkward/prime lengths."""
    for n in (2039, 2047, 4078, 12007, 24001, 65521, 131071):
        m = mfft.friendly_len(n)
        assert m >= n
        assert m - n < 64          # padding overhead stays tiny
        n1, n2 = mfft._split(m)
        assert n1 * n2 == m and max(n1, n2) <= 512
        assert mfft.is_friendly(m)
    with pytest.raises(ValueError):
        mfft.friendly_len(512 * 512 + 1)

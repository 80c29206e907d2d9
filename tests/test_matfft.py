"""Matmul-FFT (four-step Cooley-Tukey on the MXU) vs jnp.fft."""

import jax.numpy as jnp
import numpy as np
import pytest

from pyslice_tpu.ops import matfft


@pytest.mark.parametrize("n", [4, 8, 17, 96, 101, 120, 257, 1009, 1023, 1024])
def test_fft_matmul_matches_numpy(n):
    rng = np.random.default_rng(n)
    x = (rng.standard_normal((3, n))
         + 1j * rng.standard_normal((3, n))).astype(np.complex64)
    got = np.asarray(matfft.fft_matmul(jnp.asarray(x)))
    want = np.fft.fft(x, axis=-1)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    got_i = np.asarray(matfft.ifft_matmul(jnp.asarray(x)))
    want_i = np.fft.ifft(x, axis=-1)
    assert np.abs(got_i - want_i).max() / np.abs(want_i).max() < 1e-5


def test_fft_matmul_axis():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((5, 12, 7))
         + 1j * rng.standard_normal((5, 12, 7))).astype(np.complex64)
    got = np.asarray(matfft.fft_matmul(jnp.asarray(x), axis=1))
    want = np.fft.fft(x, axis=1)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_fft2_matmul():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((2, 33, 48))
         + 1j * rng.standard_normal((2, 33, 48))).astype(np.complex64)
    got = np.asarray(matfft.fft2_matmul(jnp.asarray(x)))
    want = np.fft.fft2(x)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
    rt = np.asarray(matfft.ifft2_matmul(matfft.fft2_matmul(jnp.asarray(x))))
    assert np.abs(rt - x).max() < 1e-4


def test_fft2_matmul_float64():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((2, 21, 35))
         + 1j * rng.standard_normal((2, 21, 35))).astype(np.complex128)
    got = np.asarray(matfft.fft2_matmul(jnp.asarray(x)))
    want = np.fft.fft2(x)
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


def test_dispatchers_match_jnp():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((2, 31, 40))
         + 1j * rng.standard_normal((2, 31, 40))).astype(np.complex64)
    np.testing.assert_allclose(np.asarray(matfft.fft2(jnp.asarray(x))),
                               np.fft.fft2(x), rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(matfft.ifft2(jnp.asarray(x))),
                               np.fft.ifft2(x), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(matfft.fft(jnp.asarray(x), axis=1)),
                               np.fft.fft(x, axis=1), rtol=2e-4, atol=1e-4)


def test_balanced_factors():
    assert matfft.balanced_factors(1024) == (32, 32)
    assert matfft.balanced_factors(1023) == (33, 31)
    assert matfft.balanced_factors(12) == (4, 3)
    assert matfft.balanced_factors(13) == (13, 1)   # prime

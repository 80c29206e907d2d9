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


# --- scrambled (digit-permuted) transforms ------------------------------------


@pytest.mark.parametrize("n,m", [(15, 21), (33, 31), (12, 9), (48, 33)])
def test_fft2_scrambled_is_permuted_fft2(n, m):
    rng = np.random.default_rng(n * m)
    x = (rng.standard_normal((3, n, m))
         + 1j * rng.standard_normal((3, n, m)))
    px, py = matfft.scramble_perm(n), matfft.scramble_perm(m)
    want = np.fft.fft2(x)[:, px][:, :, py]
    got = np.asarray(matfft.fft2_scrambled(jnp.asarray(x)))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


@pytest.mark.parametrize("n,m", [(15, 21), (33, 31)])
def test_scrambled_roundtrip_and_diagonal_multiply(n, m):
    """The use case: ifft2(P * fft2(x)) computed entirely in scrambled
    order with a pre-scrambled P must equal the natural-order result."""
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((2, n, m)) + 1j * rng.standard_normal((2, n, m)))
    P = rng.standard_normal((n, m)) + 1j * rng.standard_normal((n, m))
    want = np.fft.ifft2(P * np.fft.fft2(x))
    px, py = matfft.scramble_perm(n), matfft.scramble_perm(m)
    P_scr = jnp.asarray(P[px][:, py])
    got = np.asarray(matfft.ifft2_scrambled(
        P_scr * matfft.fft2_scrambled(jnp.asarray(x))))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12
    rt = np.asarray(matfft.ifft2_scrambled(matfft.fft2_scrambled(jnp.asarray(x))))
    assert np.abs(rt - x).max() < 1e-12


def test_scramble_perm_is_permutation():
    for n in (6, 15, 33, 1023):
        p = matfft.scramble_perm(n)
        assert sorted(p) == list(range(n))
    assert matfft.scrambled_ok(33) and matfft.scrambled_ok(1023)
    assert not matfft.scrambled_ok(13) and not matfft.scrambled_ok(1009)


def test_multislice_scrambled_matches_natural():
    """Force the scrambled loop on (CPU) and compare the full multislice
    propagation against the natural-order path on an odd grid."""
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.physics.propagate import multislice

    rng = np.random.default_rng(11)
    nx, ny, nz, n_probes = 33, 21, 5, 2
    psi = (rng.standard_normal((n_probes, nx, ny))
           + 1j * rng.standard_normal((n_probes, nx, ny))).astype(np.complex128)
    pot = rng.standard_normal((nz, nx, ny))
    kxs = np.fft.fftfreq(nx, d=0.1)
    kys = np.fft.fftfreq(ny, d=0.1)

    def run():
        return np.asarray(multislice(jnp.asarray(psi), jnp.asarray(pot),
                                     jnp.asarray(kxs), jnp.asarray(kys),
                                     eV=100e3, dz=0.5, precision="double"))

    old = ops_config.scrambled_fft
    try:
        ops_config.scrambled_fft = "off"
        want = run()
        ops_config.scrambled_fft = "on"
        got = run()
    finally:
        ops_config.scrambled_fft = old
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12

    # record_layers path too
    def run_layers():
        return np.asarray(multislice(jnp.asarray(psi), jnp.asarray(pot),
                                     jnp.asarray(kxs), jnp.asarray(kys),
                                     eV=100e3, dz=0.5, precision="double",
                                     record_layers=(1, nz - 1)))
    try:
        ops_config.scrambled_fft = "off"
        want = run_layers()
        ops_config.scrambled_fft = "on"
        got = run_layers()
    finally:
        ops_config.scrambled_fft = old
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-12


def test_bluestein_prime_sizes():
    """Chirp-Z (Bluestein) transform for enormous primes: O(n log n) via
    two pow2 FFTs, matching numpy at both precisions. (Measured on v5e the
    MXU full DFT wins below BLUESTEIN_MIN=4096, so realistic prime grids
    keep the matmul; 4099 exercises the dispatch.)"""
    from pyslice_tpu.ops.matfft import (BLUESTEIN_MIN, _bluestein_last,
                                        fft_matmul, ifft_matmul)
    rng = np.random.default_rng(3)
    for n in (521, 1009):
        x = (rng.standard_normal((2, n))
             + 1j * rng.standard_normal((2, n))).astype(np.complex64)
        want = np.fft.fft(x, axis=-1)
        got = np.asarray(_bluestein_last(jnp.asarray(x), False))
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-6
        gi = np.asarray(_bluestein_last(jnp.asarray(x), True))
        wi = np.fft.ifft(x, axis=-1)
        assert np.abs(gi - wi).max() / np.abs(wi).max() < 2e-6
        # float64 verification mode: near machine precision
        g64 = np.asarray(_bluestein_last(jnp.asarray(
            x.astype(np.complex128)), False))
        assert np.abs(g64 - np.fft.fft(x.astype(np.complex128), axis=-1)
                      ).max() / np.abs(want).max() < 1e-12
    # the dispatch: a prime >= BLUESTEIN_MIN goes through Bluestein,
    # small primes keep the exact full-DFT matmul
    for n in (4099, 127):
        assert (n >= BLUESTEIN_MIN) == (n == 4099)
        x = (rng.standard_normal((2, n))
             + 1j * rng.standard_normal((2, n))).astype(np.complex64)
        got = np.asarray(fft_matmul(jnp.asarray(x), -1))
        want = np.fft.fft(x, axis=-1)
        assert np.abs(got - want).max() / np.abs(want).max() < 2e-6


class TestFusedSplitCostModel:
    """Round-4 probe-aware factorization choice (measured at 1023^2x16:
    d=11/m=93 5,227 vs d=3/m=341 4,494 slice-steps/s)."""

    def test_default_unchanged(self):
        from pyslice_tpu.ops.matfft import scrambled_factors
        # no probe info / single probe: smallest-divisor heuristic (the
        # XLA scrambled path's and resident kernels' measured best)
        assert scrambled_factors(1023) == (3, 341)
        assert scrambled_factors(1023, 1) == (3, 341)
        assert scrambled_factors(1024) == (2, 512)
        assert scrambled_factors(1009) == (1009, 1)      # prime

    def test_multiprobe_model_switch(self):
        from pyslice_tpu.ops.matfft import scrambled_factors
        assert scrambled_factors(1023, 2) == (11, 93)
        assert scrambled_factors(1023, 16) == (11, 93)

    def test_supported_size_gates(self):
        from pyslice_tpu.ops.fused_step_odd import supported_size_odd
        assert supported_size_odd(1023)          # d=3, m=341
        assert supported_size_odd(1023, 16)      # model d=11, m=93 >= 64
        # m < 128 without an active model choice stays rejected
        assert not supported_size_odd(255)       # (3, 85)
        assert not supported_size_odd(255, 16)   # model kept d=3 -> gate

    def test_scramble_perm_follows_probes(self):
        import numpy as np
        from pyslice_tpu.ops.matfft import scramble_perm
        p1 = scramble_perm(1023)
        p16 = scramble_perm(1023, 16)
        assert not np.array_equal(p1, p16)
        # both are permutations
        assert sorted(p1.tolist()) == list(range(1023))
        assert sorted(p16.tolist()) == list(range(1023))

    @pytest.mark.slow

    def test_interpreter_parity_multiprobe_kernel(self):
        """The d-switched kernel structure at a small override size (the
        hardware tier covers the real 1023 d=11 split)."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu
        from pyslice_tpu.ops import config as cfg
        from pyslice_tpu.ops import matfft
        from pyslice_tpu.ops.fused_step_odd import fused_multislice_odd

        old = cfg.scrambled_d
        cfg.scrambled_d = 11
        try:
            n = 341
            assert matfft.scrambled_factors(n) == (11, 31)
            rng = np.random.default_rng(0)
            psi = (rng.standard_normal((2, n, n))
                   + 1j * rng.standard_normal((2, n, n))
                   ).astype(np.complex64)
            pot = rng.standard_normal((2, n, n)).astype(np.float32)
            kxs = np.fft.fftfreq(n, 0.1).astype(np.float32)
            lam, dz, sigma = 0.037, 0.5, 8e-4
            p = jnp.exp(-1j * np.pi * lam * dz
                        * (kxs[:, None] ** 2 + kxs[None, :] ** 2)
                        ).astype(jnp.complex64)
            t = jnp.exp(1j * sigma * jnp.asarray(pot)).astype(jnp.complex64)
            x = jnp.asarray(psi) * t[0]
            x = jnp.fft.ifft2(jnp.fft.fft2(x) * p) * t[1]
            want = np.asarray(x)
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(fused_multislice_odd(
                    jnp.asarray(psi), jnp.asarray(pot), kxs, kxs,
                    sigma=sigma, lam=lam, dz=dz))
            res = (np.sum((np.abs(got) - np.abs(want)) ** 2)
                   / np.sum(np.abs(want) ** 2))
            assert res < 1e-6, res
        finally:
            cfg.scrambled_d = old

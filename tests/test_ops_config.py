"""ops.config knob semantics: mid-process flips must take effect.

Round-2 weak #5: PYSLICE_FUSED_DOT / PYSLICE_CEINSUM / PYSLICE_SCRAMBLED_D
were raw env vars read at trace time and not part of any jit cache key, so a
mid-process flip silently kept stale compiled kernels. They are now
ops.config fields folded into physics.propagate's cache key (config.ops_key).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslice_tpu.ops import config as ops_config
from pyslice_tpu.ops import matfft


@pytest.fixture
def _restore_config():
    saved = (ops_config.fused_dot, ops_config.complex_einsum,
             ops_config.scrambled_d)
    yield
    (ops_config.fused_dot, ops_config.complex_einsum,
     ops_config.scrambled_d) = saved


def test_ops_key_covers_all_knobs(_restore_config):
    base = ops_config.ops_key()
    ops_config.fused_dot = "highest"
    assert ops_config.ops_key() != base
    ops_config.fused_dot = base[3]
    ops_config.complex_einsum = "highest"
    assert ops_config.ops_key() != base
    ops_config.complex_einsum = base[4]
    ops_config.scrambled_d = 7
    assert ops_config.ops_key() != base


def test_multislice_retraces_on_knob_flip(_restore_config):
    """Flipping a kernel knob mid-process must invalidate the compiled
    multislice trace (a stale kernel is the bug this guards against)."""
    from pyslice_tpu.physics.propagate import _multislice_jit, multislice
    from pyslice_tpu.core.dtypes import SINGLE

    nx = ny = 12
    psi = jnp.ones((1, nx, ny), jnp.complex64)
    v = jnp.zeros((3, nx, ny), jnp.float32)
    kxs = jnp.asarray(np.fft.fftfreq(nx, d=0.1).astype(np.float32))
    kys = jnp.asarray(np.fft.fftfreq(ny, d=0.1).astype(np.float32))

    def run():
        return multislice(psi, v, kxs, kys, eV=100e3, dz=0.5,
                          precision=SINGLE)

    run()
    before = _multislice_jit._cache_size()
    run()
    assert _multislice_jit._cache_size() == before    # warm: no retrace
    ops_config.complex_einsum = "high"
    run()
    assert _multislice_jit._cache_size() == before + 1  # flip: retraced


def test_complex_einsum_mode_changes_dispatch(_restore_config, monkeypatch):
    """The flip must reach the contraction strategy: 'kara' routes
    MXU-scale complex64 contractions through complex_dot_fast, 'highest'
    must not. (Bit-level differences are asserted on hardware by the -m tpu
    tier; CPU can round the bf16x3 decomposition identically.)"""
    calls = []
    real = matfft.complex_dot_fast
    monkeypatch.setattr(matfft, "complex_dot_fast",
                        lambda *a: calls.append(1) or real(*a))
    rng = np.random.default_rng(0)
    n = 1024
    a = (rng.standard_normal((n, n + 1))
         + 1j * rng.standard_normal((n, n + 1))).astype(np.complex64)
    b = (rng.standard_normal((n + 1, 64))
         + 1j * rng.standard_normal((n + 1, 64))).astype(np.complex64)

    ops_config.complex_einsum = "kara"
    fast = np.asarray(matfft.complex_einsum("ab,bc->ac", jnp.asarray(a),
                                            jnp.asarray(b)))
    assert calls, "kara mode must use the Karatsuba/bf16x3 contraction"
    calls.clear()
    ops_config.complex_einsum = "highest"
    exact = np.asarray(matfft.complex_einsum("ab,bc->ac", jnp.asarray(a),
                                             jnp.asarray(b)))
    assert not calls, "highest mode must bypass the fast contraction"
    np.testing.assert_allclose(fast, exact, rtol=2e-3, atol=2e-2)


def test_scrambled_d_override_changes_factorization(_restore_config):
    n = 1023                                       # 3 * 11 * 31
    assert matfft.scrambled_factors(n) == (3, 341)
    ops_config.scrambled_d = 11
    assert matfft.scrambled_factors(n) == (11, 93)
    ops_config.scrambled_d = 16                    # not a divisor: ignored
    assert matfft.scrambled_factors(n) == (3, 341)


def test_scrambled_d_roundtrip_still_exact(_restore_config):
    """An overridden factorization must keep fft_scrambled self-consistent
    (scramble_perm and the plan share the override)."""
    ops_config.scrambled_d = 11
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((4, 33))
         + 1j * rng.standard_normal((4, 33))).astype(np.complex64)
    xs = jnp.asarray(x)
    perm = matfft.scramble_perm(33)
    got = np.asarray(matfft.fft_scrambled(xs, -1))[:, np.argsort(perm)]
    want = np.fft.fft(x, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

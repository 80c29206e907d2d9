"""Fused Pallas multislice step vs the reference path (interpreter mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslice_tpu.core.constants import interaction_parameter, wavelength
from pyslice_tpu.core.dtypes import SINGLE
from pyslice_tpu.ops import fused_step
from pyslice_tpu.physics.propagate import multislice

# Residual bound by stage-2 dot mode: HIGHEST gives ~1e-7/step; the bf16x3
# hi/lo split (PYSLICE_FUSED_DOT=bf16x3) ~2^-16/dot, accumulating to ~1e-5
# over a few slices — both far inside the 1e-6 squared-magnitude-residual
# regression bar (00_probe.py:26-28: dz is the SQUARE of this number).
TOL = 1e-4 if fused_step._dot_mode() == "bf16x3" else 5e-6


def _compare(P, NX, NY, NZ, seed=0):
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(seed)
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5, precision=SINGLE))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_step.fused_multislice(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=interaction_parameter(eV), lam=lam, dz=0.5))
    return np.abs(got - want).max() / np.abs(want).max()


@pytest.mark.parametrize("shape", [(2, 256, 128, 4), (2, 128, 256, 3),
                                   (1, 256, 256, 2), (1, 128, 128, 1),
                                   (3, 384, 128, 5)])
@pytest.mark.slow
def test_fused_matches_reference(shape):
    assert _compare(*shape) < TOL


def _compare_odd(P, NX, NY, NZ, seed=0):
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops import fused_step_odd
    rng = np.random.default_rng(seed)
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5, precision=SINGLE,
                                 fused=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_step_odd.fused_multislice_odd(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=interaction_parameter(eV), lam=lam, dz=0.5))
    return np.abs(got - want).max() / np.abs(want).max()


@pytest.mark.parametrize("shape", [(2, 387, 393, 3), (1, 393, 387, 2),
                                   (1, 387, 387, 1), (2, 389 * 1 + 4, 387, 2)])
@pytest.mark.slow
def test_fused_odd_matches_reference(shape):
    """Digit-split odd-grid Pallas kernel vs the XLA path (interpreter)."""
    from pyslice_tpu.ops import fused_step_odd
    P, NX, NY, NZ = shape
    if not (fused_step_odd.supported_size_odd(NX)
            and fused_step_odd.supported_size_odd(NY)):
        pytest.skip(f"{NX}x{NY} not odd-kernel eligible")
    assert _compare_odd(*shape) < TOL


@pytest.mark.slow


def test_fused_odd_record_layers():
    """Depth recording on the odd kernel (segment chaining) vs XLA."""
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops import fused_step_odd
    rng = np.random.default_rng(4)
    P, NX, NY, NZ = 1, 387, 387, 4
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5, precision=SINGLE,
                                 fused=False, record_layers=(1, 3)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_step_odd.fused_multislice_odd(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=interaction_parameter(eV), lam=lam, dz=0.5,
            record_layers=(1, 3)))
    assert got.shape == want.shape == (2, P, NX, NY)
    assert np.abs(got - want).max() / np.abs(want).max() < TOL


def test_supported_size_odd():
    from pyslice_tpu.ops import fused_step_odd
    assert fused_step_odd.supported_size_odd(1023)   # 3 * 341
    assert fused_step_odd.supported_size_odd(387)    # 3 * 129
    assert fused_step_odd.supported_size_odd(1022)   # 2 * 511
    assert not fused_step_odd.supported_size_odd(1009)  # prime
    assert not fused_step_odd.supported_size_odd(385)   # 5*77: m < 128
    assert not fused_step_odd.supported_size_odd(187)   # 11*17: d > 8


def test_supported_size():
    assert fused_step.supported_size(1024)
    assert fused_step.supported_size(128)
    assert fused_step.supported_size(2048)
    assert not fused_step.supported_size(1023)
    assert not fused_step.supported_size(100)
    assert not fused_step.supported_size(64)


def test_digit_perm_is_permutation():
    for n in (128, 256, 1024):
        p = fused_step.digit_perm(n)
        assert sorted(p.tolist()) == list(range(n))


def test_unsupported_grid_raises():
    psi = jnp.zeros((1, 100, 128), jnp.complex64)
    v = jnp.zeros((2, 100, 128), jnp.float32)
    with pytest.raises(ValueError, match="unsupported grid"):
        fused_step.fused_multislice(psi, v, np.zeros(100, np.float32),
                                    np.zeros(128, np.float32),
                                    sigma=1e-3, lam=0.037, dz=0.5)


@pytest.mark.slow


def test_fused_record_layers():
    """Segmented fused run with zero-slice resumes == unfused depth
    recording."""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(3)
    P, NX, NY, NZ = 2, 256, 128, 6
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    layers = (0, 2, 5)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5,
                                 record_layers=layers, precision=SINGLE,
                                 fused=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_step.fused_multislice(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=interaction_parameter(eV), lam=lam, dz=0.5,
            record_layers=layers))
    assert got.shape == want.shape == (3, P, NX, NY)
    assert np.abs(got - want).max() / np.abs(want).max() < TOL


@pytest.mark.slow


def test_fused_kspace_matches_separate_conversion():
    """fused_multislice_kspace == fftshift(fft2(fused exit wave))."""
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops.fused_step import fused_multislice_kspace
    rng = np.random.default_rng(5)
    for (P, NX, NY, NZ) in [(2, 256, 128, 4), (1, 256, 256, 1)]:
        psi = (rng.standard_normal((P, NX, NY))
               + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
        v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
        kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
        kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
        eV = 100e3
        lam = wavelength(eV)
        sigma = interaction_parameter(eV)
        with pltpu.force_tpu_interpret_mode():
            exitw = np.asarray(fused_step.fused_multislice(
                jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                sigma=sigma, lam=lam, dz=0.5))
            got = np.asarray(fused_multislice_kspace(
                jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                sigma=sigma, lam=lam, dz=0.5))
        want = np.fft.fftshift(np.fft.fft2(exitw), axes=(-2, -1))
        assert np.abs(got - want).max() / np.abs(want).max() < TOL


def test_unpermute_shift_indices():
    from pyslice_tpu.ops.fused_step import digit_perm, unpermute_shift_indices
    for n in (128, 256, 1024):
        x = np.random.rand(n).astype(np.float32)
        permuted = x[digit_perm(n)]              # what the kernels emit
        idx = unpermute_shift_indices(n)
        np.testing.assert_array_equal(permuted[idx], np.fft.fftshift(x))


# --- VMEM-resident kernel (ops.fused_step_resident) --------------------------


def _compare_resident(P, NX, NY, NZ, seed=0):
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops import fused_step_resident as fsr
    rng = np.random.default_rng(seed)
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    sigma = interaction_parameter(eV)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5, precision=SINGLE,
                                 fused=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fsr.fused_multislice_resident(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=sigma, lam=lam, dz=0.5))
        got_k = np.asarray(fsr.fused_multislice_kspace_resident(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=sigma, lam=lam, dz=0.5))
    want_k = np.fft.fftshift(np.fft.fft2(want), axes=(-2, -1))
    return (np.abs(got - want).max() / np.abs(want).max(),
            np.abs(got_k - want_k).max() / np.abs(want_k).max())


@pytest.mark.parametrize("shape", [(2, 256, 128, 4), (2, 128, 256, 3),
                                   (1, 128, 128, 2), (1, 256, 256, 5),
                                   (1, 384, 128, 3),
                                   (4, 128, 128, 3)])  # pre_t=True branch
@pytest.mark.slow
def test_resident_matches_reference(shape):
    """VMEM-resident kernel (exit wave + fused k-conversion) vs XLA path."""
    r, rk = _compare_resident(*shape)
    assert r < TOL
    assert rk < TOL


def test_resident_record_layers():
    """Depth recording via segment chaining on the resident kernel."""
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops import fused_step_resident as fsr
    rng = np.random.default_rng(7)
    P, NX, NY, NZ = 2, 256, 128, 6
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    layers = (0, 2, 5)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5,
                                 record_layers=layers, precision=SINGLE,
                                 fused=False))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fsr.fused_multislice_resident(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=interaction_parameter(eV), lam=lam, dz=0.5,
            record_layers=layers))
    assert got.shape == want.shape == (3, P, NX, NY)
    assert np.abs(got - want).max() / np.abs(want).max() < TOL


def test_resident_support_and_preference():
    from pyslice_tpu.ops import fused_step_resident as fsr
    assert fsr.resident_supported(1024, 1024, 14)
    assert not fsr.resident_supported(1023, 1024, 14)   # not 128-multiple
    assert not fsr.resident_supported(2048, 1024, 14)   # over VMEM budget
    assert not fsr.resident_supported(256, 256, 1)      # pure transmission
    # measured dispatch crossover: few probes -> resident, many -> chain
    assert fsr.resident_preferred(1, 1024, 1024)
    assert fsr.resident_preferred(2, 1024, 1024)
    assert not fsr.resident_preferred(16, 1024, 1024)
    assert fsr.resident_preferred(16, 512, 512)


@pytest.mark.slow


def test_chain_inkernel_transmission_fallback(monkeypatch):
    """Above PRECOMPUTE_T_MAX_BYTES the chain streams sigma*V and takes
    cos/sin in-kernel (half the transmission HBM footprint) — identical
    math to the precomputed-plane path."""
    from jax.experimental.pallas import tpu as pltpu
    rng = np.random.default_rng(7)
    P, NX, NY, NZ = 2, 128, 128, 4
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    lam = wavelength(100e3)
    sig = interaction_parameter(100e3)
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(fused_step.fused_multislice(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys, sigma=sig, lam=lam,
            dz=0.5))
        monkeypatch.setattr(fused_step, "PRECOMPUTE_T_MAX_BYTES", 1)
        assert len(fused_step._chain_t_planes(sig, jnp.asarray(v))) == 1
        got = np.asarray(fused_step.fused_multislice(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys, sigma=sig, lam=lam,
            dz=0.5))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def _compare_odd_resident(P, NX, NY, NZ, seed=0, kspace=False):
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops import fused_step_odd_resident as odr
    rng = np.random.default_rng(seed)
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    eV = 100e3
    lam = wavelength(eV)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=eV, lam=lam, dz=0.5, precision=SINGLE,
                                 fused=False))
    with pltpu.force_tpu_interpret_mode():
        if kspace:
            got = np.asarray(odr.fused_multislice_kspace_odd_resident(
                jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                sigma=interaction_parameter(eV), lam=lam, dz=0.5))
            want = np.asarray(jnp.fft.fftshift(
                jnp.fft.fft2(jnp.asarray(want)), axes=(-2, -1)))
        else:
            got = np.asarray(odr.fused_multislice_odd_resident(
                jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                sigma=interaction_parameter(eV), lam=lam, dz=0.5))
    return np.abs(got - want).max() / np.abs(want).max()


# P=1/2 exercise the in-kernel sigma*V transmit, P=4 the precomputed
# (cos, sin) planes (PRECOMPUTE_T_MIN_PROBES).
@pytest.mark.parametrize("shape", [(1, 387, 387, 3), (2, 387, 393, 4),
                                   (4, 393, 387, 2), (1, 387, 387, 2)])
@pytest.mark.slow
def test_odd_resident_matches_reference(shape):
    assert _compare_odd_resident(*shape) < TOL


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(1, 387, 387, 3), (4, 387, 393, 2)])
def test_odd_resident_kspace_matches(shape):
    """Fused exit conversion: both scramble orders + the ODD-size
    fftshift unpermuted by one static gather."""
    assert _compare_odd_resident(*shape, kspace=True) < TOL


@pytest.mark.slow


def test_odd_resident_record_layers():
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops import fused_step_odd_resident as odr
    rng = np.random.default_rng(4)
    P, NX, NY, NZ = 1, 387, 387, 4
    psi = (rng.standard_normal((P, NX, NY))
           + 1j * rng.standard_normal((P, NX, NY))).astype(np.complex64)
    v = (rng.standard_normal((NZ, NX, NY)) * 50).astype(np.float32)
    kxs = np.fft.fftfreq(NX, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(NY, 0.1).astype(np.float32)
    lam = wavelength(100e3)
    want = np.asarray(multislice(jnp.asarray(psi), jnp.asarray(v), kxs, kys,
                                 eV=100e3, lam=lam, dz=0.5, precision=SINGLE,
                                 fused=False, record_layers=(1, 3)))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(odr.fused_multislice_odd_resident(
            jnp.asarray(psi), jnp.asarray(v), kxs, kys,
            sigma=interaction_parameter(100e3), lam=lam, dz=0.5,
            record_layers=(1, 3)))
    assert got.shape == want.shape == (2, P, NX, NY)
    assert np.abs(got - want).max() / np.abs(want).max() < TOL


def test_odd_resident_support():
    from pyslice_tpu.ops import fused_step_odd_resident as odr
    assert odr.resident_odd_supported(1023, 1023, 14, 1)
    assert odr.resident_odd_supported(387, 393, 3, 4)
    assert not odr.resident_odd_supported(1009, 1009, 3, 1)   # prime
    assert not odr.resident_odd_supported(387, 387, 1, 1)     # nz < 2
    # VMEM overflow: huge composite odd axes fall back to the chain
    assert not odr.resident_odd_supported(2049, 2049, 8, 4)

"""Probe aberration surface (physics.aberrations) — beyond-reference.

The reference's only aberration is defocus (multislice.py:183-190); these
pin the full surface against that anchor (aberrate(C1=dz) == defocus(dz)),
plus unitarity, symmetry, and engine plumbing.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyslice_tpu.core.constants import wavelength
from pyslice_tpu.core.dtypes import SINGLE
from pyslice_tpu.physics.aberrations import (Aberrations, apply_aberrations,
                                             chi_phase)
from pyslice_tpu.physics.probe import Probe
from pyslice_tpu.utils.host import to_numpy


def _probe(nx=64, ny=48, mrad=20.0):
    xs = np.linspace(0, nx * 0.2, nx, endpoint=False)
    ys = np.linspace(0, ny * 0.2, ny, endpoint=False)
    return Probe(xs, ys, mrad, 100e3, precision=SINGLE)


def test_c1_equals_defocus():
    """aberrate(C1=dz) is exactly the Fresnel defocus multiply."""
    dz = 180.0
    pa = _probe()
    pb = pa.copy()
    pa.defocus(dz)
    pb.aberrate(C1=dz)
    a, b = to_numpy(pa.array), to_numpy(pb.array)
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-6


def test_zero_is_identity():
    p = _probe()
    before = to_numpy(p.array)
    p.aberrate()                       # all coefficients zero
    np.testing.assert_array_equal(to_numpy(p.array), before)


def test_norm_conserved():
    """|exp(-i chi)| == 1: any aberration surface conserves probe norm."""
    p = _probe()
    n0 = np.linalg.norm(to_numpy(p.array))
    p.aberrate(C1=-120.0, C3=1.2e7, A1=40.0, phi_A1=0.3,
               B2=3e4, phi_B2=1.1, A2=2e4, C5=5e9)
    n1 = np.linalg.norm(to_numpy(p.array))
    assert abs(n1 - n0) / n0 < 1e-5


def test_cs_broadens_probe():
    """Uncorrected Cs at zero defocus spreads the probe (larger RMS
    radius); Scherzer defocus partially refocuses it."""
    lam = wavelength(100e3)
    ab = Aberrations(C3=1.0e7)                 # 1 mm Cs
    base = _probe(128, 128, mrad=25.0)

    def rms_radius(probe):
        a = np.abs(to_numpy(probe.array)) ** 2
        a /= a.sum()
        nx, ny = a.shape
        x = np.arange(nx) - nx // 2
        y = np.arange(ny) - ny // 2
        # probe is centered at the grid origin corner after ifftshift;
        # recenter by rolling the peak to the middle
        i, j = np.unravel_index(np.argmax(a), a.shape)
        a = np.roll(a, (nx // 2 - i, ny // 2 - j), axis=(0, 1))
        return float((a * (x[:, None] ** 2 + y[None, :] ** 2)).sum())

    p_cs = base.copy()
    p_cs.aberrate(ab)
    p_scherzer = base.copy()
    p_scherzer.aberrate(ab, C1=ab.scherzer_defocus(lam))
    r0 = rms_radius(base)
    r_cs = rms_radius(p_cs)
    r_sch = rms_radius(p_scherzer)
    assert r_cs > 1.5 * r0             # Cs alone visibly broadens
    assert r_sch < r_cs                # Scherzer defocus refocuses


def test_astigmatism_axes():
    """Twofold astigmatism: chi has opposite sign along kx vs ky when
    phi_A1 = 0 (cos 2phi = +1 on the x axis, -1 on the y axis)."""
    ab = Aberrations(A1=100.0)
    lam = wavelength(100e3)
    q = 0.5
    chi_x = chi_phase(np.array(q * q), np.array(q), np.array(0.0),
                      lam=lam, ab=ab)
    chi_y = chi_phase(np.array(q * q), np.array(0.0), np.array(q),
                      lam=lam, ab=ab)
    assert chi_x > 0 and np.isclose(chi_x, -chi_y, rtol=1e-12)
    # and it equals the defocus-term magnitude at the same coefficient
    assert np.isclose(chi_x, np.pi * lam * 100.0 * q * q, rtol=1e-12)


def test_anisotropic_on_oblique_raises():
    ab = Aberrations(A1=50.0)
    with pytest.raises(ValueError, match="anisotropic"):
        apply_aberrations(jnp.ones((8, 8), jnp.complex64),
                          None, None, wavelength(100e3), ab,
                          SINGLE, ksq=np.ones((8, 8)))


def test_isotropic_on_oblique_ok():
    """C1/C3/C5 work through the |k|^2 metric path (oblique cells)."""
    ab = Aberrations(C1=100.0, C3=1e6)
    nx = ny = 16
    kxs = np.fft.fftfreq(nx, 0.2)
    kys = np.fft.fftfreq(ny, 0.2)
    ksq = kxs[:, None] ** 2 + kys[None, :] ** 2   # orthogonal metric
    psi = jnp.ones((nx, ny), jnp.complex64)
    via_ksq = to_numpy(apply_aberrations(psi, None, None, wavelength(100e3),
                                         ab, SINGLE, ksq=ksq))
    via_axes = to_numpy(apply_aberrations(psi, kxs, kys, wavelength(100e3),
                                          ab, SINGLE))
    assert np.abs(via_ksq - via_axes).max() < 1e-6


def test_calculator_setup_aberrations():
    """setup(aberrations=...) applies the surface to the base probe and
    enters the frame-cache key."""
    from pyslice_tpu.data.trajectory import Trajectory
    from pyslice_tpu.engine.calculator import MultisliceCalculator

    pos = np.array([[[2.0, 2.0, 0.5], [4.0, 3.0, 1.0]]])
    traj = Trajectory(np.array([5, 7], np.int32), pos, np.zeros_like(pos),
                      np.diag([8.0, 8.0, 2.0]), 0.005)
    kw = dict(trajectory=traj, aperture=20.0, voltage_eV=100e3,
              sampling=0.4, slice_thickness=1.0, use_cache=False)

    calc_ab = MultisliceCalculator()
    calc_ab.setup(aberrations={"C3": 1e7, "C1": -100.0}, **kw)
    calc_plain = MultisliceCalculator()
    calc_plain.setup(**kw)
    a = to_numpy(calc_ab.base_probe.array)
    b = to_numpy(calc_plain.base_probe.array)
    assert np.abs(a - b).max() > 1e-6          # surface actually applied
    assert calc_ab._generate_cache_key() != calc_plain._generate_cache_key()

    # Aberrations dataclass accepted too, equal to the dict spelling
    calc_dc = MultisliceCalculator()
    calc_dc.setup(aberrations=Aberrations(C3=1e7, C1=-100.0), **kw)
    c = to_numpy(calc_dc.base_probe.array)
    assert np.abs(a - c).max() / np.abs(a).max() < 1e-6

"""Differentiable-multislice inversion (examples/inverse_potential.py).

Beyond-reference capability test: gradient descent through the full
multislice loop recovers a projected potential from intensity-only
diffraction measurements. Tiny problem, CPU, a few hundred Adam steps.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from inverse_potential import build_problem, correlation, recover  # noqa: E402


def test_inverse_recovers_potential():
    from pyslice_tpu.core.constants import wavelength

    prob = build_problem(nx=48, ny=48, nz=2, seed=1)
    v_rec, hist = recover(prob, steps=400, lr=30.0, log_every=0,
                          log=lambda *a: None)
    # the optimizer must actually fit the measurements ...
    assert hist[-1] < hist[0] / 1000
    # ... and the fitted potential must resemble the truth within the
    # probe's information limit |k| < 2 alpha / lambda (mean-free per
    # slice — a per-slice constant is a global phase).
    q_max = 2 * 25.0e-3 / wavelength(100e3)
    c = correlation(v_rec, prob["v_true"], prob["kxs"], prob["kys"], q_max)
    assert c > 0.7, f"band-limited correlation {c}"
    # raw correlation (includes the unmeasurable band) still substantial
    assert correlation(v_rec, prob["v_true"]) > 0.6


def test_refine_structure_recovers_coordinates():
    """Atomic-coordinate refinement (engine/inverse.py): data simulated at
    the true structure, the model started from 0.06 A rms in-plane jitter
    — gradient descent through rasterize + the multislice adjoint must
    recover the coordinates essentially exactly (noiseless data), leave z
    untouched (slice binning has zero gradient), and collapse the loss."""
    import jax.numpy as jnp

    from pyslice_tpu.core.dtypes import get_precision
    from pyslice_tpu.engine.inverse import refine_structure
    from pyslice_tpu.physics.potential import make_plan, rasterize
    from pyslice_tpu.physics.probe import Probe, shift_probes
    from pyslice_tpu.physics.propagate import multislice

    prec = get_precision("single")
    NX = NY = 48
    S, EV, MRAD, DZ = 0.15, 100e3, 22.0, 1.0
    lx, ly = NX * S, NY * S
    xs = np.linspace(0, lx, NX, endpoint=False)
    ys = np.linspace(0, ly, NY, endpoint=False)
    zs = np.array([0.0, DZ])
    rng = np.random.default_rng(2)
    n_at = 8
    pos_true = np.column_stack([rng.uniform(0.15 * lx, 0.85 * lx, n_at),
                                rng.uniform(0.15 * ly, 0.85 * ly, n_at),
                                rng.uniform(0.2, 2 * DZ - 0.2, n_at)])
    types = rng.choice([5, 7], n_at).astype(np.int32)
    plan = make_plan(xs, ys, zs, pos_true[None], types)
    v = rasterize(jnp.asarray(pos_true, prec.real), plan, prec)

    base = Probe(xs, ys, MRAD, EV, precision=prec)
    n_s = 10
    scan = np.array([(i * lx / n_s, j * ly / n_s)
                     for i in range(n_s) for j in range(n_s)])
    probes = shift_probes(base.array, base.kxs, base.kys, scan,
                          precision=prec)
    ew = multislice(probes, v, base.kxs, base.kys, eV=EV, dz=DZ,
                    precision=prec, fused=False)
    inten = np.asarray(jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(ew),
                                                axes=(-2, -1)))) ** 2

    jit0 = rng.normal(0, 0.06, (n_at, 2))
    pos_start = pos_true.copy()
    pos_start[:, :2] += jit0
    err0 = float(np.sqrt(np.mean(jit0 ** 2)))

    rec = refine_structure(inten, scan, base, pos_start, types, zs,
                           steps=300, batch=50, lr=5e-3)
    d = rec["positions"][:, :2] - pos_true[:, :2]
    err1 = float(np.sqrt(np.mean(d ** 2)))
    assert err1 < err0 / 20, f"xy rms {err0:.4f} -> {err1:.4f} A"
    assert rec["losses"][-1] < rec["losses"][0] / 1e4
    np.testing.assert_allclose(rec["positions"][:, 2],
                               pos_start[:, 2].astype(np.float32),
                               rtol=0, atol=1e-7)
    assert rec["displacement"].shape == (n_at,)


@pytest.mark.slow


def test_refine_aberrations_recovers_coefficients():
    """Instrument self-calibration: data simulated with an aberrated probe
    (C1=60 A defocus, C3=1e5 A spherical, A1=25 A astigmatism at 0.5 rad),
    fitted jointly with the (unknown) potential starting from the CLEAN
    probe — the residual coefficients must come back, across physical
    scales spanning 4 orders of magnitude (the RMS-normalized basis)."""
    import jax.numpy as jnp

    from pyslice_tpu.core.dtypes import get_precision
    from pyslice_tpu.core.constants import wavelength
    from pyslice_tpu.engine.inverse import refine_aberrations
    from pyslice_tpu.physics.aberrations import Aberrations, apply_aberrations
    from pyslice_tpu.physics.potential import make_plan, rasterize
    from pyslice_tpu.physics.probe import Probe, shift_probes
    from pyslice_tpu.physics.propagate import multislice

    prec = get_precision("single")
    NX = NY = 64
    S, EV, MRAD, DZ = 0.15, 100e3, 20.0, 1.0
    lx, ly = NX * S, NY * S
    xs = np.linspace(0, lx, NX, endpoint=False)
    ys = np.linspace(0, ly, NY, endpoint=False)
    zs = np.array([0.0, DZ])
    rng = np.random.default_rng(3)
    pos = rng.random((1, 10, 3)) * np.array([lx, ly, 2 * DZ - 0.1])
    types = rng.choice([5, 7], 10).astype(np.int32)
    plan = make_plan(xs, ys, zs, pos, types)
    v_true = rasterize(jnp.asarray(pos[0], prec.real), plan, prec)
    lam = wavelength(EV)

    base = Probe(xs, ys, MRAD, EV, precision=prec)
    ab_true = Aberrations(C1=60.0, C3=1.0e5, A1=25.0, phi_A1=0.5)
    p_true = apply_aberrations(base.array, base.kxs, base.kys, lam,
                               ab_true, precision=prec)
    n_s = 16
    positions = np.array([(i * lx / n_s, j * ly / n_s)
                          for i in range(n_s) for j in range(n_s)])
    probes = shift_probes(p_true, base.kxs, base.kys, positions,
                          precision=prec)
    ew = multislice(probes, v_true, base.kxs, base.kys, eV=EV, dz=DZ,
                    precision=prec, fused=False)
    inten = np.asarray(jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(ew),
                                                axes=(-2, -1)))) ** 2

    rec = refine_aberrations(inten, positions, base,
                             coefficients=("C1", "C3", "A1"),
                             n_slices=2, dz=DZ, steps=800, batch=64,
                             lr=8.0, lr_ab=0.05)
    ab = rec["aberrations"]
    assert rec["losses"][-1] < rec["losses"][0] / 20
    assert abs(ab.C1 - 60.0) < 6.0, f"C1 {ab.C1}"
    assert abs(ab.C3 - 1.0e5) < 1.5e4, f"C3 {ab.C3}"
    assert abs(ab.A1 - 25.0) < 5.0, f"A1 {ab.A1}"
    # azimuth modulo pi/m ambiguity resolved by the (a, b) fit directly
    assert abs(((ab.phi_A1 - 0.5 + np.pi / 2) % np.pi) - np.pi / 2) < 0.15, \
        f"phi_A1 {ab.phi_A1}"

    with pytest.raises(ValueError, match="unknown aberration"):
        refine_aberrations(inten[:4], positions[:4], base,
                           coefficients=("C9",), steps=1)


@pytest.mark.slow


def test_refine_structure_tilt_series_recovers_3d():
    """Tomographic coordinate refinement: a 3-angle tilt series (+-30, 0)
    constrains ALL THREE coordinates — full 3-D jitter (including z,
    invisible to any single projection) must be recovered essentially
    exactly on noiseless data."""
    import jax.numpy as jnp

    from pyslice_tpu.core.dtypes import get_precision
    from pyslice_tpu.engine.inverse import (refine_structure_tilt_series,
                                            rotation_about_x)
    from pyslice_tpu.physics.potential import make_plan, rasterize
    from pyslice_tpu.physics.probe import Probe, shift_probes
    from pyslice_tpu.physics.propagate import multislice

    prec = get_precision("single")
    NX = NY = 48
    S, EV, MRAD, DZ = 0.15, 100e3, 22.0, 1.0
    lx, ly = NX * S, NY * S
    xs = np.linspace(0, lx, NX, endpoint=False)
    ys = np.linspace(0, ly, NY, endpoint=False)
    zs = np.arange(4) * DZ
    rng = np.random.default_rng(2)
    n_at = 6
    pos_true = np.column_stack([rng.uniform(0.3 * lx, 0.7 * lx, n_at),
                                rng.uniform(0.35 * ly, 0.65 * ly, n_at),
                                rng.uniform(1.2, 2.8, n_at)])
    types = rng.choice([5, 7], n_at).astype(np.int32)
    base = Probe(xs, ys, MRAD, EV, precision=prec)
    tilts = [-30.0, 0.0, 30.0]
    ctr = pos_true.mean(axis=0)

    n_s = 8
    scan = np.array([(0.25 * lx + i * lx / (2 * n_s),
                      0.25 * ly + j * ly / (2 * n_s))
                     for i in range(n_s) for j in range(n_s)])
    datasets, scans = [], []
    for ang in tilts:
        r_mat = rotation_about_x(np.deg2rad(ang))
        rot = (pos_true - ctr) @ r_mat.T + ctr
        plan = make_plan(xs, ys, zs, rot[None], types, pad_fraction=0.5)
        v = rasterize(jnp.asarray(rot, prec.real), plan, prec)
        probes = shift_probes(base.array, base.kxs, base.kys, scan,
                              precision=prec)
        ew = multislice(probes, v, base.kxs, base.kys, eV=EV, dz=DZ,
                        precision=prec, fused=False)
        datasets.append(np.asarray(
            jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(ew),
                                     axes=(-2, -1)))) ** 2)
        scans.append(scan)

    jit3d = rng.normal(0, 0.05, (n_at, 3))       # includes z
    pos_start = pos_true + jit3d
    err0 = np.sqrt(np.mean(jit3d ** 2))
    err0_z = np.sqrt(np.mean(jit3d[:, 2] ** 2))

    rec = refine_structure_tilt_series(datasets, scans, base, pos_start,
                                       types, zs, tilts, steps=450,
                                       batch=32, lr=5e-3, center=ctr)
    d = rec["positions"] - pos_true
    err1 = np.sqrt(np.mean(d ** 2))
    err1_z = np.sqrt(np.mean(d[:, 2] ** 2))
    assert err1 < err0 / 10, f"3D rms {err0:.4f} -> {err1:.4f}"
    assert err1_z < err0_z / 10, f"z rms {err0_z:.4f} -> {err1_z:.4f}"
    assert rec["losses"][-1] < rec["losses"][0] / 100

    with pytest.raises(ValueError, match="per tilt"):
        refine_structure_tilt_series(datasets[:2], scans, base, pos_start,
                                     types, zs, tilts, steps=3)

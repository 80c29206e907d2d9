"""Partial-coherence models (engine.coherence) — beyond-reference."""

import numpy as np
import pytest

from pyslice_tpu.engine.coherence import (defocus_series, defocus_spread,
                                          source_size_blur)


def test_source_blur_conserves_and_spreads():
    rng = np.random.default_rng(0)
    img = np.zeros((64, 64))
    img[32, 32] = 1.0                      # point response
    out = source_size_blur(img, (0.2, 0.2), fwhm=1.0)
    # total intensity conserved (DC of the Gaussian envelope is 1)
    assert abs(out.sum() - img.sum()) < 1e-12
    # peak reduced, neighbors raised
    assert out[32, 32] < 1.0
    assert out[34, 32] > 0.0
    # measured FWHM of the response ~ requested (5 px = 1.0 A / 0.2 A/px)
    prof = out[:, 32]
    half = prof.max() / 2
    width_px = np.sum(prof >= half)
    assert 3 <= width_px <= 7
    # zero fwhm = identity
    np.testing.assert_array_equal(source_size_blur(img, (0.2, 0.2), 0.0),
                                  img)
    with pytest.raises(ValueError, match="2-D"):
        source_size_blur(np.zeros(5), (0.1, 0.1), 1.0)


def test_defocus_series_quadrature():
    """Gauss-Hermite nodes/weights integrate Gaussians exactly enough:
    weights sum to 1, mean = center, variance = delta^2 / 2."""
    delta = 80.0
    nodes, w = defocus_series(delta, n=9, center=-30.0)
    assert abs(w.sum() - 1.0) < 1e-12
    assert abs((w * nodes).sum() + 30.0) < 1e-9
    var = (w * (nodes + 30.0) ** 2).sum()
    assert abs(var - delta ** 2 / 2) / (delta ** 2 / 2) < 1e-12
    # degenerate cases
    n0, w0 = defocus_series(0.0, n=5, center=12.0)
    assert n0.tolist() == [12.0] and w0.tolist() == [1.0]
    assert defocus_spread(1.2e7, 0.3, 100e3) == pytest.approx(36.0)


def test_defocus_series_averages_probe_intensity():
    """Incoherent averaging over the series smooths the probe the same way
    physically expected: the averaged intensity is broader than coherent."""
    from pyslice_tpu.core.dtypes import SINGLE
    from pyslice_tpu.physics.probe import Probe
    from pyslice_tpu.utils.host import to_numpy

    nx = ny = 64
    xs = np.linspace(0, nx * 0.2, nx, endpoint=False)
    ys = np.linspace(0, ny * 0.2, ny, endpoint=False)
    base = Probe(xs, ys, 25.0, 100e3, precision=SINGLE)
    nodes, w = defocus_series(120.0, n=5)
    avg = np.zeros((nx, ny))
    for df, wi in zip(nodes, w):
        p = base.copy()
        if df:
            p.defocus(float(df))
        avg += wi * np.abs(to_numpy(p.array)) ** 2
    coh = np.abs(to_numpy(base.array)) ** 2
    # same total intensity, lower peak (spread out)
    assert abs(avg.sum() - coh.sum()) / coh.sum() < 1e-3
    assert avg.max() < coh.max()


def test_chromatic_envelope_matches_analytic():
    """The Gauss-Hermite quadrature through the ACTUAL Probe.defocus path
    reproduces the analytic chromatic damping envelope (Kirkland ch. 5):
    |<exp(-i pi lam df k^2)>_df| = exp(-(pi lam delta k^2)^2 / 4) for the
    Gaussian spread p(df) ~ exp(-df^2/delta^2), to ~1% inside the
    aperture (round-3 item 5's validation requirement)."""
    from pyslice_tpu.core.constants import wavelength
    from pyslice_tpu.core.dtypes import DOUBLE
    from pyslice_tpu.physics.probe import Probe
    from pyslice_tpu.utils.host import to_numpy

    nx = ny = 96
    d = 0.25
    xs = np.linspace(0, nx * d, nx, endpoint=False)
    ys = np.linspace(0, ny * d, ny, endpoint=False)
    eV, mrad = 100e3, 20.0
    lam = wavelength(eV)
    delta = 150.0
    base = Probe(xs, ys, mrad, eV, precision=DOUBLE)

    nodes, w = defocus_series(delta, n=24)
    avg_k = np.zeros((nx, ny), complex)
    for df, wi in zip(nodes, w):
        p = base.copy()
        p.defocus(float(df))
        avg_k += wi * np.fft.fft2(to_numpy(p.array))
    base_k = np.fft.fft2(to_numpy(base.array))

    kxs = np.fft.fftfreq(nx, d=d)
    kys = np.fft.fftfreq(ny, d=d)
    ksq = kxs[:, None] ** 2 + kys[None, :] ** 2
    inside = np.abs(base_k) > 0.5 * np.abs(base_k).max()
    got = np.abs(avg_k[inside]) / np.abs(base_k[inside])
    want = np.exp(-((np.pi * lam * delta * ksq[inside]) ** 2) / 4.0)
    # only meaningful where the envelope hasn't collapsed to ~0
    sel = want > 1e-3
    assert np.abs(got[sel] - want[sel]).max() < 0.01


def test_chromatic_stem_one_call():
    """chromatic_stem composes thermal + chromatic + source blur; the
    delta->one-node limit must equal the plain frozen-phonon facade."""
    from pyslice_tpu.engine.thermal import frozen_phonon_haadf
    from pyslice_tpu.engine.coherence import chromatic_stem
    from pyslice_tpu.physics.probe import probe_grid
    from tests.fixtures import hbn_thermal

    traj = hbn_thermal(n_frames=2, sigma=0.05, seed=5)
    pg = probe_grid([1, 3], [1, 3], 3, 3)
    common = dict(voltage_eV=100e3, aperture=30.0, sampling=0.25,
                  slice_thickness=0.8, collection_angle=45.0)

    img0, xs0, ys0 = frozen_phonon_haadf(
        traj, pg, n_configs=3, sigma=0.05, seed=2, intensity=True, **common)
    img1, xs1, ys1 = chromatic_stem(
        traj, pg, Cc=1.2e7, dE=0.0, n_nodes=5, n_configs=3,
        thermal_sigma=0.05, seed=2, **common)          # dE=0 -> single node
    np.testing.assert_allclose(img1, img0, rtol=1e-10)
    np.testing.assert_array_equal(xs1, xs0)

    img2, _, _ = chromatic_stem(
        traj, pg, Cc=1.2e7, dE=1.0, n_nodes=5, n_configs=3,
        thermal_sigma=0.05, seed=2, **common)          # delta = 120 A
    assert not np.allclose(img2, img0, rtol=1e-6)      # chromatic matters

    img3, _, _ = chromatic_stem(
        traj, pg, Cc=1.2e7, dE=1.0, n_nodes=5, n_configs=3,
        thermal_sigma=0.05, seed=2, source_fwhm=1.5, **common)
    assert abs(img3.sum() - img2.sum()) / abs(img2.sum()) < 1e-10  # blur conserves
    assert not np.allclose(img3, img2)


def test_chromatic_diffraction_plane_wave_invariant():
    """aperture=0: a plane wave's intensity is defocus-invariant (the
    Fresnel multiplier only touches the k=0 phase), so the chromatic
    average must equal the single-defocus pattern."""
    from pyslice_tpu.engine.thermal import frozen_phonon_diffraction
    from pyslice_tpu.engine.coherence import chromatic_diffraction
    from tests.fixtures import hbn_thermal

    traj = hbn_thermal(n_frames=2, sigma=0.05, seed=6)
    common = dict(voltage_eV=100e3, sampling=0.25, slice_thickness=0.8)
    pat0 = frozen_phonon_diffraction(traj, n_configs=2, sigma=0.05, seed=1,
                                     aperture=0.0, **common)
    pat1 = chromatic_diffraction(traj, Cc=1.2e7, dE=0.5, n_nodes=3,
                                 n_configs=2, thermal_sigma=0.05, seed=1,
                                 aperture=0.0, **common)
    # each nonzero node pays one float32 fft2/ifft2 roundtrip of noise
    np.testing.assert_allclose(pat1, pat0, rtol=2e-3)

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

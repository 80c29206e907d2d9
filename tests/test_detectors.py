"""Detector geometries / virtual imaging + frozen-phonon facades."""

import numpy as np
import pytest

from pyslice_tpu.analysis import detectors
from pyslice_tpu.analysis.haadf import HAADFData
from pyslice_tpu.core.dtypes import DOUBLE
from pyslice_tpu.engine.calculator import MultisliceCalculator
from pyslice_tpu.engine.thermal import (frozen_phonon_diffraction,
                                        frozen_phonon_haadf,
                                        thermal_configs)
from pyslice_tpu.physics.probe import probe_grid
from tests.fixtures import hbn_thermal

SAMPLING = 0.25
SLICE_T = 0.8


@pytest.fixture(scope="module")
def haadf_wf():
    traj = hbn_thermal(n_frames=2, sigma=0.05, seed=5)
    pg = probe_grid((1.0, 4.0), (1.0, 4.0), 3, 2)
    calc = MultisliceCalculator(precision=DOUBLE)
    calc.setup(traj, aperture=25, voltage_eV=100e3, sampling=SAMPLING,
               slice_thickness=SLICE_T, probe_positions=pg, use_cache=False)
    return calc.run(progress=False)


class TestMasks:
    def test_annular_matches_haadf_mask(self, haadf_wf):
        """inner-only annular_mask reproduces HAADFData's detector
        (q > theta/lambda, haadf_data.py:47-50)."""
        lam = haadf_wf.probe.wavelength
        m = detectors.annular_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                   inner_mrad=45.0)
        q = np.sqrt(np.add.outer(np.asarray(haadf_wf.kxs) ** 2,
                                 np.asarray(haadf_wf.kys) ** 2))
        want = (q > (45.0 * 1e-3) / lam).astype(float)
        np.testing.assert_array_equal(m, want)

    def test_bright_field_disk(self, haadf_wf):
        lam = haadf_wf.probe.wavelength
        bf = detectors.annular_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                    inner_mrad=0.0, outer_mrad=10.0)
        adf = detectors.annular_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                     inner_mrad=10.0)
        # disk + annulus covers k-space except the exact ring boundary
        both = bf + adf
        assert np.all((both == 1.0) | (both == 0.0))
        assert bf[len(haadf_wf.kxs) // 2, len(haadf_wf.kys) // 2] == 1.0

    def test_segmented_sums_to_annulus(self, haadf_wf):
        lam = haadf_wf.probe.wavelength
        segs = detectors.segmented_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                        10.0, 40.0, n_segments=4,
                                        rotation_deg=15.0)
        ring = detectors.annular_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                      10.0, 40.0)
        assert segs.shape[0] == 4
        np.testing.assert_allclose(segs.sum(axis=0), ring)


class TestVirtualImaging:
    def test_virtual_image_matches_calculateADF(self, haadf_wf):
        """virtual_image with the HAADF mask and amplitude detector equals
        HAADFData.calculateADF exactly."""
        lam = haadf_wf.probe.wavelength
        mask = detectors.annular_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                      inner_mrad=45.0)
        got = detectors.virtual_image(haadf_wf, mask, intensity=False)
        want = HAADFData(haadf_wf).calculateADF(collection_angle=45)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_segmented_virtual_images(self, haadf_wf):
        lam = haadf_wf.probe.wavelength
        segs = detectors.segmented_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                        5.0, 60.0, n_segments=4)
        imgs = detectors.virtual_image(haadf_wf, segs)
        assert imgs.shape == (4, 3, 2)
        ring = detectors.annular_mask(haadf_wf.kxs, haadf_wf.kys, lam,
                                      5.0, 60.0)
        total = detectors.virtual_image(haadf_wf, ring)
        np.testing.assert_allclose(imgs.sum(axis=0), total, rtol=1e-10)

    def test_center_of_mass_shape_and_scale(self, haadf_wf):
        com = detectors.center_of_mass(haadf_wf)
        assert com.shape == (2, 3, 2)
        kmax = np.abs(np.asarray(haadf_wf.kxs)).max()
        assert np.all(np.abs(com) <= kmax)

    def test_bin_k(self):
        a = np.arange(24, dtype=float).reshape(4, 6)
        b = detectors.bin_k(a, 2)
        assert b.shape == (2, 3)
        assert b[0, 0] == a[0, 0] + a[0, 1] + a[1, 0] + a[1, 1]
        # trailing remainder cropped
        c = detectors.bin_k(np.ones((5, 7)), 2)
        assert c.shape == (2, 3) and np.all(c == 4.0)


class TestFrozenPhonon:
    def test_thermal_configs(self):
        traj = hbn_thermal(n_frames=3, sigma=0.05)
        cfg = thermal_configs(traj, 5, 0.08, seed=1)
        assert cfg.n_frames == 5
        # gaussian, zero-mean-ish around the mean structure
        d = cfg.positions - traj.get_mean_positions()[None]
        assert abs(d.mean()) < 0.05
        assert 0.04 < d.std() < 0.13

    def test_frozen_phonon_haadf(self):
        traj = hbn_thermal(n_frames=2, sigma=0.05)
        pg = probe_grid((1.0, 4.0), (1.0, 4.0), 2, 2)
        img, xs, ys = frozen_phonon_haadf(
            traj, pg, n_configs=3, sigma=0.05, aperture=25,
            voltage_eV=100e3, sampling=SAMPLING, slice_thickness=SLICE_T)
        assert img.shape == (2, 2)
        assert np.all(np.isfinite(img)) and np.all(img >= 0)
        assert len(xs) == 2 and len(ys) == 2

    def test_frozen_phonon_diffraction(self):
        traj = hbn_thermal(n_frames=2, sigma=0.05)
        patt = frozen_phonon_diffraction(
            traj, n_configs=3, sigma=0.05, voltage_eV=100e3,
            sampling=SAMPLING, slice_thickness=SLICE_T)
        assert patt.ndim == 2 and np.all(np.isfinite(patt))
        # thermal average keeps total intensity ~ the elastic total
        assert patt.sum() > 0

def test_apply_shot_noise():
    """Poisson dose model: counts are integers >= 0, expectation tracks
    lam = image * dose * pixel_area, variance ~ lam, reproducible by seed,
    and infinite dose converges to the noiseless image shape."""
    from pyslice_tpu.analysis.detectors import apply_shot_noise

    rng = np.random.default_rng(0)
    image = rng.random((40, 40)) * 0.02          # detected beam fractions
    dose, area = 5e3, 0.25
    counts = apply_shot_noise(image, dose, area, seed=1)
    assert counts.shape == image.shape
    assert np.all(counts >= 0)
    assert np.allclose(counts, np.round(counts))
    lam = image * dose * area
    # mean over many pixels: relative error ~ 1/sqrt(sum(lam))
    assert abs(counts.sum() - lam.sum()) / lam.sum() < 0.02
    # reproducibility
    np.testing.assert_array_equal(counts,
                                  apply_shot_noise(image, dose, area, seed=1))
    assert not np.array_equal(counts,
                              apply_shot_noise(image, dose, area, seed=2))
    # high dose -> relative fluctuations shrink
    hi = apply_shot_noise(image, 1e8, area, seed=1)
    rel = np.abs(hi / (image * 1e8 * area) - 1.0)
    assert np.median(rel) < 1e-2


class TestPACBEDAndRadial:
    def test_pacbed_is_probe_frame_mean(self, haadf_wf):
        got = detectors.pacbed(haadf_wf)
        wf = np.asarray(haadf_wf.wavefunction_data)
        want = np.mean(np.abs(wf[..., -1]) ** 2, axis=(0, 1))
        np.testing.assert_allclose(got, want, rtol=1e-12)
        # subset restriction
        got2 = detectors.pacbed(haadf_wf, probe_indices=[0, 2])
        want2 = np.mean(np.abs(wf[[0, 2], ..., -1]) ** 2, axis=(0, 1))
        np.testing.assert_allclose(got2, want2, rtol=1e-12)

    def test_radial_profile_isotropic(self, haadf_wf):
        """An isotropic Gaussian profiles to its own radial law."""
        kxs = np.asarray(haadf_wf.kxs)
        kys = np.asarray(haadf_wf.kys)
        q2 = np.add.outer(kxs ** 2, kys ** 2)
        pattern = np.exp(-q2 / 0.5)
        # the fixture grid is only 21 x 35 px — keep bins populated
        centers, prof = detectors.radial_profile(pattern, kxs, kys,
                                                 n_bins=16)
        want = np.exp(-centers ** 2 / 0.5)
        # bin-center vs bin-mean discretization bounds the error
        assert np.max(np.abs(prof - want)) < 0.05
        assert prof.shape == (16,)

    def test_radial_profile_batched_and_validation(self, haadf_wf):
        kxs = np.asarray(haadf_wf.kxs)
        kys = np.asarray(haadf_wf.kys)
        pats = np.random.default_rng(0).random((2, len(kxs), len(kys)))
        centers, prof = detectors.radial_profile(pats, kxs, kys, n_bins=16)
        assert prof.shape == (2, 16)
        c0, p0 = detectors.radial_profile(pats[0], kxs, kys, n_bins=16)
        np.testing.assert_allclose(prof[0], p0)
        with pytest.raises(ValueError, match="kmax"):
            detectors.radial_profile(pats[0], kxs, kys, kmax=0.0)


def test_detector_mtf():
    """MTF blur: energy-conserving (MTF(0)=1), identity at mtf=1, reduces
    high-frequency variance, and the parametric floor keeps a point's
    central pixel dominant."""
    from pyslice_tpu.analysis.detectors import apply_detector_mtf

    rng = np.random.default_rng(0)
    pat = rng.random((3, 32, 32))
    out = apply_detector_mtf(pat, a=0.1, c=0.4)
    # energy conserved per pattern
    np.testing.assert_allclose(out.sum(axis=(-2, -1)),
                               pat.sum(axis=(-2, -1)), rtol=1e-12)
    # identity MTF is exact
    ident = apply_detector_mtf(pat, mtf=lambda w: np.ones_like(w))
    np.testing.assert_allclose(ident, pat, atol=1e-12)
    # blur shrinks fluctuation
    assert out.std() < pat.std()
    # a point source spreads but keeps its center as the max
    point = np.zeros((16, 16))
    point[8, 8] = 1.0
    sp = apply_detector_mtf(point, a=0.05, c=0.3)
    assert sp[8, 8] == sp.max() and 0 < sp[8, 8] < 1
    import pytest as _pytest
    with _pytest.raises(ValueError, match="floor"):
        apply_detector_mtf(point, a=1.5)


def test_detector_mtf_order_validation():
    from pyslice_tpu.analysis.detectors import apply_detector_mtf
    with pytest.raises(ValueError, match="order"):
        apply_detector_mtf(np.ones((8, 8)), order=0.0)
    with pytest.raises(ValueError, match="order"):
        apply_detector_mtf(np.ones((8, 8)), order=-2.0)

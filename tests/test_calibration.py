"""Measured-data calibration toolkit (round-4 verdict item 2).

Every solve is validated by injecting a known corruption and recovering
it: rotation to sub-degree accuracy, descan to sub-pixel, dead/hot pixels
exactly; the integration test corrupts a SIMULATED datacube and shows the
iCoM reconstruction of the calibrated cube matching the clean one.
"""

import numpy as np
import pytest

from pyslice_tpu.analysis import calibration as cal


def _gaussian_bumps_field(n=48, seed=0):
    """A known conservative CoM field: grad(phi)/2pi of positive bumps."""
    rng = np.random.default_rng(seed)
    x = np.arange(n)[:, None]
    y = np.arange(n)[None, :]
    phi = np.zeros((n, n))
    for _ in range(6):
        cx, cy = rng.uniform(8, n - 8, 2)
        phi += np.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * 3.0 ** 2))
    gx, gy = np.gradient(phi, 1.0, 1.0)
    # the framework's measured convention (icom_reconstruct input):
    # M = -(1/2pi) grad_R[phi(c - R)] — minus a gradient of positive bumps
    return phi, -np.stack([gx, gy]) / (2 * np.pi)


class TestRotation:
    @pytest.mark.parametrize("theta_deg", [0.0, 23.0, 101.5, 247.0])
    @pytest.mark.parametrize("transpose", [False, True])
    def test_recovers_injected_rotation(self, theta_deg, transpose):
        _, com = _gaussian_bumps_field()
        th = np.radians(theta_deg)
        # instrument transform: rotate by -th (so the solve's correction
        # is +th), then optionally swap the reported components
        meas = cal.apply_rotation(com, -th)
        if transpose:
            meas = np.stack([meas[1], meas[0]])
        sol = cal.solve_rotation(meas, 1.0, 1.0)
        assert sol["transpose"] == transpose
        err = (np.degrees(sol["theta"]) - theta_deg) % 360.0
        err = min(err, 360.0 - err)
        assert err < 1.0, f"recovered {np.degrees(sol['theta']):.2f} deg"
        assert sol["curl_rms"] < 0.05
        # and the corrected field is actually conservative again
        fixed = cal.apply_rotation(meas, sol["theta"], sol["transpose"])
        np.testing.assert_allclose(fixed, com, atol=1e-10)

    def test_branch_without_attractive_prior(self):
        """assume_attractive=False returns the curl-minimizing branch in
        [0, pi) — theta and theta+pi are curl-indistinguishable."""
        _, com = _gaussian_bumps_field()
        meas = cal.apply_rotation(com, -np.radians(200.0))
        sol = cal.solve_rotation(meas, 1.0, 1.0, assume_attractive=False)
        assert 0.0 <= sol["theta"] < np.pi
        err = abs(np.degrees(sol["theta"]) - 20.0)
        assert err < 1.0


class TestDescan:
    def test_fit_recovers_linear_drift(self):
        _, com = _gaussian_bumps_field()
        sx = np.arange(48) * 0.2
        sy = np.arange(48) * 0.25
        gx, gy = np.meshgrid(sx, sy, indexing="ij")
        drift = np.stack([0.03 + 0.011 * gx - 0.007 * gy,
                          -0.02 + 0.004 * gx + 0.009 * gy])
        fit = cal.fit_descan(com + drift, sx, sy)
        # the fit absorbs the injected drift PLUS com's own linear part;
        # compare against fitting the clean field
        fit0 = cal.fit_descan(com, sx, sy)
        np.testing.assert_allclose(
            fit["coeffs"] - fit0["coeffs"],
            [[0.03, 0.011, -0.007], [-0.02, 0.004, 0.009]], atol=1e-9)
        np.testing.assert_allclose(fit["corrected"], fit0["corrected"],
                                   atol=1e-9)

    def test_apply_descan_subpixel(self):
        """Patterns drifting linearly across the scan come back to a
        common center to sub-pixel accuracy."""
        n_s, nk = 12, 32
        sx = np.arange(n_s) * 1.0
        kx = np.arange(nk)[:, None]
        ky = np.arange(nk)[None, :]
        data = np.zeros((n_s, n_s, nk, nk))
        for i in range(n_s):
            for j in range(n_s):
                cx = nk / 2 + 0.31 * i - 0.17 * j    # injected descan
                cy = nk / 2 - 0.23 * i + 0.08 * j
                data[i, j] = np.exp(-((kx - cx) ** 2 + (ky - cy) ** 2)
                                    / (2 * 3.0 ** 2))
        com = cal.com_field(data)
        fit = cal.fit_descan(com, sx, sx)
        out = cal.apply_descan(data, fit["coeffs"], sx, sx,
                               k_per_pixel=1.0, subpixel=True)
        com_after = cal.com_field(out)
        assert np.abs(com_after).max() < 0.05   # sub-pixel residual
        assert np.abs(com).max() > 2.0          # the drift was real


class TestPixels:
    def test_find_and_fix(self):
        rng = np.random.default_rng(1)
        data = rng.poisson(50.0, (6, 6, 24, 24)).astype(float)
        data[:, :, 5, 7] = 9000.0      # hot (stuck bright)
        data[:, :, 12, 3] = 0.0        # dead (stuck zero)
        bad = cal.find_bad_pixels(data)
        assert bad[5, 7] and bad[12, 3]
        assert bad.sum() == 2
        fixed = cal.fix_pixels(data, bad)
        assert abs(fixed[:, :, 5, 7].mean() - 50.0) < 15.0
        assert abs(fixed[:, :, 12, 3].mean() - 50.0) < 15.0
        # good pixels untouched
        good = ~bad
        np.testing.assert_array_equal(fixed[:, :, good], data[:, :, good])

    def test_dark_gain(self):
        data = np.full((2, 2, 4, 4), 10.0)
        dark = np.full((4, 4), 2.0)
        gain = np.full((4, 4), 4.0)
        gain[0, 0] = 0.0               # dead channel
        out = cal.apply_dark_gain(data, dark, gain)
        assert out[0, 0, 1, 1] == 2.0
        assert out[0, 0, 0, 0] == 0.0


def _elliptic_disk(nk=64, center=(31.0, 33.5), a=14.0, b=11.0,
                   angle_deg=25.0, edge=0.4):
    """Soft-edged elliptic bright-field disk (synthetic detector image)."""
    x = np.arange(nk)[:, None] - center[0]
    y = np.arange(nk)[None, :] - center[1]
    th = np.radians(angle_deg)
    u = np.cos(th) * x + np.sin(th) * y
    v = -np.sin(th) * x + np.cos(th) * y
    r = np.sqrt((u / a) ** 2 + (v / b) ** 2)
    return 1.0 / (1.0 + np.exp((r - 1.0) / (edge / a)))


class TestEllipse:
    def test_recovers_injected_ellipticity(self):
        disk = _elliptic_disk()
        fit = cal.fit_bf_disk_ellipse(disk)
        assert fit["ellipticity"] == pytest.approx(14.0 / 11.0, abs=0.02)
        assert np.degrees(fit["angle"]) == pytest.approx(25.0, abs=2.0)
        np.testing.assert_allclose(fit["center"], (31.0, 33.5), atol=0.3)
        # area-preserving correction
        assert np.linalg.det(fit["correction"]) == pytest.approx(1.0,
                                                                 abs=1e-9)

    def test_apply_circularizes_and_conserves_counts(self):
        disk = _elliptic_disk()
        fit = cal.fit_bf_disk_ellipse(disk)
        fixed = cal.apply_elliptic_correction(disk[None, None], fit)[0, 0]
        refit = cal.fit_bf_disk_ellipse(fixed)
        assert refit["ellipticity"] < 1.01, refit["ellipticity"]
        assert fixed.sum() == pytest.approx(disk.sum(), rel=0.01)

    def test_com_correction_is_exact_linear_map(self):
        fit = cal.fit_bf_disk_ellipse(_elliptic_disk())
        rng = np.random.default_rng(0)
        com = rng.standard_normal((2, 5, 7))
        got = cal.correct_com_ellipse(com, fit)
        want = np.tensordot(fit["correction"], com, axes=(1, 0))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rejects_empty_segmentation(self):
        with pytest.raises(ValueError, match="fewer than 9"):
            cal.fit_bf_disk_ellipse(np.zeros((32, 32)))


class TestAffineScan:
    A_INJ = np.array([[1.020, 0.013], [-0.009, 0.985]])
    G = np.array([[1 / 2.5, 0.0], [0.12, 1 / 3.1]])   # rows: g1, g2

    @staticmethod
    def _lattice_image(A, n=128, dx=0.2):
        """Lattice sampled where the beam ACTUALLY lands (x = A @ r)."""
        xs = np.arange(n) * dx
        gx, gy = np.meshgrid(xs, xs, indexing="ij")
        r = np.stack([gx, gy])
        x = np.einsum("ij,j...->i...", A, r)
        img = 2.0
        for g in TestAffineScan.G:
            img = img + np.cos(2 * np.pi * (g[0] * x[0] + g[1] * x[1]))
        return img, xs

    def test_recovers_injected_affine(self):
        img, xs = self._lattice_image(self.A_INJ)
        fit = cal.fit_affine_scan(img, xs, xs, self.G)
        np.testing.assert_allclose(fit["A"], self.A_INJ, atol=5e-3)
        assert all(s > 3 for s in fit["peak_snr"]), fit["peak_snr"]
        # identity scan: A recovered as I to the same tolerance
        img0, _ = self._lattice_image(np.eye(2))
        fit0 = cal.fit_affine_scan(img0, xs, xs, self.G)
        np.testing.assert_allclose(fit0["A"], np.eye(2), atol=5e-3)

    def test_apply_affine_restores_lattice(self):
        img, xs = self._lattice_image(self.A_INJ)
        ideal, _ = self._lattice_image(np.eye(2))
        fit = cal.fit_affine_scan(img, xs, xs, self.G)
        fixed = cal.apply_affine_scan(img, fit["A"], xs, xs)
        # interior (clamped edges excluded): distorted image disagreed
        # with the ideal lattice; the corrected one matches it
        sl = slice(8, -8)
        before = np.sqrt(np.mean((img[sl, sl] - ideal[sl, sl]) ** 2))
        after = np.sqrt(np.mean((fixed[sl, sl] - ideal[sl, sl]) ** 2))
        assert after < 0.12 and after < before / 5, (before, after)

    def test_apply_affine_moves_cube_patterns_rigidly(self):
        # a 4-D cube resamples its SCAN axes only: a cube whose pattern
        # equals its scan position index map transforms like the image
        n = 24
        xs = np.arange(n) * 0.5
        img, _ = self._lattice_image(self.A_INJ, n=n, dx=0.5)
        cube = np.broadcast_to(img[:, :, None, None], (n, n, 3, 3)).copy()
        out = cal.apply_affine_scan(cube, self.A_INJ, xs, xs)
        want = cal.apply_affine_scan(img, self.A_INJ, xs, xs)
        for i, j in ((0, 0), (1, 2), (2, 1)):
            np.testing.assert_allclose(out[:, :, i, j], want, atol=1e-12)

    def test_missing_peak_raises(self):
        img, xs = self._lattice_image(np.eye(2), n=16, dx=0.2)
        with pytest.raises(ValueError, match="no Fourier samples"):
            cal.fit_affine_scan(img, xs, xs, [[40.0, 0.0], [0.0, 40.0]])


def test_estimate_dose():
    data = np.full((4, 5, 8, 8), 2.0)       # 128 e per pattern
    d = cal.estimate_dose(data, scan_step=0.5)
    assert d["dose"] == pytest.approx(128.0 / 0.25)
    assert d["electrons_per_position"].shape == (4, 5)
    assert d["total"] == pytest.approx(128.0 * 20)


def test_calibrate_datacube_end_to_end_icom():
    """Integration: a SIMULATED 4D-STEM cube (real multislice physics,
    plus a detector PSF — real detectors never see single-pixel-sharp
    features) is corrupted with sub-pixel linear descan + stuck hot/dead
    pixels, then calibrated. The iCoM phase reconstructed from the
    calibrated CoM FIELD (the deflection product — weak-phase CoM signals
    live at the milli-pixel scale, below any pattern-resampling noise
    floor) must match the clean reconstruction, up to the unavoidable
    information loss at the two replaced pixels (the reference applies
    the same replacement)."""
    from pyslice_tpu.analysis.ptychography import (icom_reconstruct,
                                                   scan_grid_data)
    from pyslice_tpu.engine.calculator import MultisliceCalculator
    from pyslice_tpu.physics.probe import probe_grid
    from tests.fixtures import hbn_monolayer

    traj = hbn_monolayer(2, 2)
    box = np.asarray(traj.box_matrix)
    n_s = 24                               # dense scan: step ~0.2 A
    pg = probe_grid([0.0, box[0, 0]], [0.0, box[1, 1]], n_s, n_s)
    calc = MultisliceCalculator()
    calc.setup(traj, aperture=25, voltage_eV=100e3, sampling=0.25,
               slice_thickness=3.5, probe_positions=pg.tolist(),
               use_cache=False)
    wf = calc.run(progress=False)
    xs, ys, raw = scan_grid_data(wf)
    dk = float(np.asarray(wf.kxs)[1] - np.asarray(wf.kxs)[0])

    # detector PSF: circular Gaussian, sigma 1.2 px. Symmetric kernel =>
    # the CoM field is EXACTLY preserved (first moments add under
    # convolution); pattern-level operations become well-conditioned.
    nkx, nky = raw.shape[-2:]
    fx = np.fft.fftfreq(nkx)[:, None]
    fy = np.fft.fftfreq(nky)[None, :]
    psf_hat = np.exp(-2 * np.pi ** 2 * 1.2 ** 2 * (fx ** 2 + fy ** 2))
    clean = np.real(np.fft.ifft2(np.fft.fft2(raw) * psf_hat))
    np.clip(clean, 0, None, out=clean)

    # corrupt: smooth sub-pixel linear descan + stuck hot and dead pixels
    inject = np.array([[0.1, -0.06, 0.04], [-0.08, 0.05, 0.06]])  # px
    cube = cal.apply_descan(clean, inject, xs, ys, k_per_pixel=1.0,
                            subpixel=True)
    hot, dead = (nkx // 3, nky // 4), (2 * nkx // 3, nky // 2)
    cube[:, :, hot[0], hot[1]] = cube.max() * 50
    cube[:, :, dead[0], dead[1]] = 0.0

    res = cal.calibrate_datacube(cube, xs, ys, kxs=wf.kxs, kys=wf.kys,
                                 subpixel_descan=True)
    assert res["bad_pixels"].sum() == 2
    assert res["bad_pixels"][hot] and res["bad_pixels"][dead]
    # rotation recovered to well under a degree, correct branch (the
    # PSF-smoothed field is skewed enough to determine it)
    rot_deg = np.degrees(res["rotation"]) % 360.0
    assert min(rot_deg, 360.0 - rot_deg) < 1.0, rot_deg
    assert not res["transpose"]
    assert res["rotation_diag"]["skewness"] < -0.1
    # the injected linear drift is recovered to sub-pixel accuracy: the
    # descan fit sees MINUS the injection (apply_descan shifts by -drift)
    # plus the specimen's own (tiny) linear component, in k units
    dky = float(np.asarray(wf.kys)[1] - np.asarray(wf.kys)[0])
    np.testing.assert_allclose(res["descan"]["coeffs"][:, 1:]
                               / np.array([[dk], [dky]]),
                               -inject[:, 1:], atol=0.005)

    # reference: the clean cube with the SAME two pixels median-replaced
    # (information at a defective pixel is gone for any method)
    ref_cube = cal.fix_pixels(clean, res["bad_pixels"])
    ref_com = cal.fit_descan(cal.com_field(ref_cube, wf.kxs, wf.kys),
                             xs, ys)["corrected"]
    ref = icom_reconstruct(None, xs, ys, wf.kxs, wf.kys, probe=wf.probe,
                           com=ref_com)
    got = icom_reconstruct(None, xs, ys, wf.kxs, wf.kys, probe=wf.probe,
                           com=res["com"])
    scale = np.abs(ref["phase"]).max()
    err = np.abs(got["phase"] - ref["phase"]).max() / scale
    assert err < 0.02, f"calibrated iCoM deviates {err:.3f} from clean"
    assert got["curl_rms"] < ref["curl_rms"] * 1.2 + 0.02

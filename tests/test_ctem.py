"""HRTEM/CTEM image formation (engine.ctem) — beyond-reference."""

import numpy as np
import pytest

from pyslice_tpu.core.constants import wavelength
from pyslice_tpu.core.dtypes import DOUBLE
from pyslice_tpu.engine.coherence import defocus_series
from pyslice_tpu.engine.ctem import (_tilt_series, hrtem_image,
                                     image_from_exit_wave,
                                     objective_transfer)
from pyslice_tpu.physics.aberrations import Aberrations
from tests.fixtures import hbn_thermal

LAM = wavelength(100e3)


def _axes(nx=64, ny=48, d=0.2):
    xs = np.linspace(0, nx * d, nx, endpoint=False)
    ys = np.linspace(0, ny * d, ny, endpoint=False)
    kxs = np.fft.fftfreq(nx, d)
    kys = np.fft.fftfreq(ny, d)
    return xs, ys, kxs, kys


class TestImageFormation:
    def test_identity_lens(self):
        """Zero aberrations + open aperture: the image IS |psi_exit|^2."""
        rng = np.random.default_rng(0)
        xs, ys, kxs, kys = _axes()
        psi = (rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48)))
        img = np.asarray(image_from_exit_wave(psi, kxs, kys, lam=LAM,
                                              precision=DOUBLE))
        np.testing.assert_allclose(img, np.abs(psi) ** 2, rtol=1e-10)

    def test_power_conserved_phase_only_ctf(self):
        """|H| == 1 without an aperture -> total intensity conserved."""
        rng = np.random.default_rng(1)
        xs, ys, kxs, kys = _axes()
        psi = (rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48)))
        ab = Aberrations(C1=-500.0, C3=1.2e7, A1=30.0, phi_A1=0.4)
        img = np.asarray(image_from_exit_wave(psi, kxs, kys, lam=LAM, ab=ab,
                                              precision=DOUBLE))
        np.testing.assert_allclose(img.sum(), (np.abs(psi) ** 2).sum(),
                                   rtol=1e-10)

    def test_input_spaces_agree(self):
        rng = np.random.default_rng(2)
        xs, ys, kxs, kys = _axes()
        psi = (rng.normal(size=(64, 48)) + 1j * rng.normal(size=(64, 48)))
        ab = Aberrations(C1=200.0)
        kw = np.fft.fft2(psi)
        a = np.asarray(image_from_exit_wave(psi, kxs, kys, lam=LAM, ab=ab,
                                            precision=DOUBLE))
        b = np.asarray(image_from_exit_wave(kw, kxs, kys, lam=LAM, ab=ab,
                                            input_space="k",
                                            precision=DOUBLE))
        c = np.asarray(image_from_exit_wave(
            np.fft.fftshift(kw), kxs, kys, lam=LAM, ab=ab,
            input_space="k_shifted", precision=DOUBLE))
        np.testing.assert_allclose(a, b, rtol=1e-12)
        np.testing.assert_allclose(a, c, rtol=1e-12)
        with pytest.raises(ValueError, match="input_space"):
            image_from_exit_wave(psi, kxs, kys, lam=LAM, input_space="bad")

    def test_objective_aperture_mask(self):
        _, _, kxs, kys = _axes()
        h = objective_transfer(kxs, kys, lam=LAM, aperture=10.0)
        q = np.sqrt(kxs[:, None] ** 2 + kys[None, :] ** 2)
        k_max = 10e-3 / LAM
        np.testing.assert_array_equal(np.abs(h) > 0.5, q <= k_max)
        assert np.all(np.abs(h[q <= k_max]) == 1.0)

    def test_weak_phase_contrast_and_chromatic_envelope(self):
        """Weak phase grating psi = exp(i eps cos(2 pi g x)): the image
        contrast at g is 2 eps sin(chi(g)); the chromatic defocus series
        damps it by the analytic temporal envelope
        exp(-(pi lam delta g^2)^2 / 4) (Kirkland ch. 5)."""
        nx, ny, d = 128, 16, 0.2
        xs, ys, kxs, kys = _axes(nx, ny, d)
        m = 10
        g = m / (nx * d)                          # exact grid frequency
        eps = 1e-3
        psi = np.exp(1j * eps * np.cos(2 * np.pi * g * xs))[:, None] \
            * np.ones((1, ny))
        df = -400.0
        cos_basis = np.cos(2 * np.pi * g * xs)

        img = np.asarray(image_from_exit_wave(
            psi, kxs, kys, lam=LAM, ab=Aberrations(C1=df),
            precision=DOUBLE))
        c_coh = 2.0 * (img.mean(axis=1) * cos_basis).mean()
        expect_coh = 2.0 * eps * np.sin(np.pi * LAM * df * g * g)
        np.testing.assert_allclose(c_coh, expect_coh, rtol=2e-3)

        # chromatic series: quadrature-averaged contrast matches both the
        # node-weighted sum (exact) and the analytic envelope (~1%)
        delta = 150.0
        nodes, w = defocus_series(delta, n=21, center=0.0)
        avg = None
        for node, wi in zip(nodes, w):
            im = np.asarray(image_from_exit_wave(
                psi, kxs, kys, lam=LAM, ab=Aberrations(C1=df + node),
                precision=DOUBLE))
            avg = wi * im if avg is None else avg + wi * im
        c_chrom = 2.0 * (avg.mean(axis=1) * cos_basis).mean()
        expect_sum = 2.0 * eps * np.sum(
            w * np.sin(np.pi * LAM * (df + nodes) * g * g))
        np.testing.assert_allclose(c_chrom, expect_sum, rtol=5e-3)
        envelope = np.exp(-(np.pi * LAM * delta * g * g) ** 2 / 4.0)
        expect_env = expect_coh * envelope
        assert envelope < 0.9                     # the damping is material
        np.testing.assert_allclose(c_chrom, expect_env, rtol=2e-2)


class TestTiltSeries:
    def test_degenerate(self):
        t, w = _tilt_series(0.0, 5, LAM)
        np.testing.assert_array_equal(t, [[0.0, 0.0]])
        np.testing.assert_array_equal(w, [1.0])
        # Requesting partial spatial coherence with a degenerate tilt
        # sampling must fail loudly, not silently return the coherent image.
        with pytest.raises(ValueError, match="n_tilts"):
            _tilt_series(1.0, 1, LAM)

    def test_weights_and_symmetry(self):
        t, w = _tilt_series(2.0, 5, LAM)
        assert t.shape == (25, 2) and w.shape == (25,)
        assert abs(w.sum() - 1.0) < 1e-12
        np.testing.assert_allclose((w[:, None] * t).sum(axis=0), 0.0,
                                   atol=1e-15)
        # 1/e half-angle: per-axis second moment = (beta/lam)^2 / 2
        var = (w * t[:, 0] ** 2).sum()
        beta_k = 2.0e-3 / LAM
        np.testing.assert_allclose(var, beta_k ** 2 / 2, rtol=1e-10)


class TestHRTEM:
    @pytest.fixture()
    def traj(self):
        return hbn_thermal(n_frames=2, sigma=0.03, nx=2, ny=2)

    def test_smoke_and_shape(self, traj):
        img, xs, ys = hrtem_image(
            traj, n_configs=2, thermal_sigma=0.03, sampling=0.25,
            defocus=-300.0, Cc=1.0e7, dE=0.5, n_nodes=3)
        assert img.shape == (len(xs), len(ys))
        assert np.all(np.isfinite(img)) and img.min() >= 0
        assert img.std() > 1e-4 * img.mean()       # real contrast

    def test_coherent_limit_matches_manual_path(self, traj):
        """n_configs=0 (use frames), no chromatic/tilt spread: hrtem_image
        == mean over frames of image_from_exit_wave(multislice exit)."""
        from pyslice_tpu.core.grids import grid_from_trajectory
        from pyslice_tpu.engine.pipeline import SimSpec, frame_exit_waves
        from pyslice_tpu.physics.potential import make_plan

        ab = Aberrations(C1=-200.0, C3=1.0e7)
        img, xs, ys = hrtem_image(traj, n_configs=0, sampling=0.25,
                                  aberrations=ab, objective_aperture=25.0)

        grid = grid_from_trajectory(traj, sampling=0.25,
                                    slice_thickness=0.5)
        plan = make_plan(grid.xs, grid.ys, grid.zs, traj.positions,
                         traj.atom_types)
        spec = SimSpec.create(grid, plan, 100e3)
        waves = np.ones((1, grid.nx, grid.ny), dtype=spec.precision.complex)
        manual = np.zeros((grid.nx, grid.ny))
        for c in range(traj.n_frames):
            kw = np.asarray(frame_exit_waves(traj.positions[c], waves,
                                             spec)[0, ..., -1])
            manual += np.asarray(image_from_exit_wave(
                kw, plan.kxs, plan.kys, lam=LAM, ab=ab, aperture=25.0,
                input_space="k_shifted", precision=spec.precision))
        manual /= traj.n_frames
        np.testing.assert_allclose(img, manual, rtol=1e-5, atol=1e-8)

    def test_tilt_batch_runs_and_blurs(self, traj):
        sharp, _, _ = hrtem_image(traj, n_configs=1, thermal_sigma=0.0,
                                  sampling=0.25, defocus=-300.0)
        # beta large enough that the grid-snapped tilts (multiples of 1/L,
        # L ~ 5 A) are distinct: beta >= lam/L ~ 7.3 mrad at 100 kV.
        soft, _, _ = hrtem_image(traj, n_configs=1, thermal_sigma=0.0,
                                 sampling=0.25, defocus=-300.0,
                                 beam_semiangle=20.0, n_tilts=3)
        assert sharp.shape == soft.shape
        # incoherent tilt averaging reduces (defocus-displaced copies) or
        # at worst keeps the contrast
        assert soft.std() <= sharp.std() * 1.01

    def test_tiny_tilt_collapses_to_coherent(self, traj):
        """Tilts below the reciprocal-lattice quantum snap to zero — the
        result must equal the untilted image exactly."""
        a, _, _ = hrtem_image(traj, n_configs=1, thermal_sigma=0.0,
                              sampling=0.25, defocus=-300.0)
        b, _, _ = hrtem_image(traj, n_configs=1, thermal_sigma=0.0,
                              sampling=0.25, defocus=-300.0,
                              beam_semiangle=0.5, n_tilts=3)
        np.testing.assert_allclose(a, b, rtol=1e-6)

    def test_oblique_tilt_rejected(self, traj):
        import dataclasses as dc
        box = np.array(traj.box_matrix)
        box[0, 1] = 1.0                            # xy tilt
        tri = dc.replace(traj, box_matrix=box) if dc.is_dataclass(traj) \
            else None
        if tri is None:
            pytest.skip("trajectory not a dataclass")
        with pytest.raises(ValueError, match="beam_semiangle=0"):
            hrtem_image(tri, n_configs=1, sampling=0.25,
                        beam_semiangle=1.0, n_tilts=3)

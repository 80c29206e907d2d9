"""Focal-series exit-wave reconstruction (analysis.ewr) — beyond-reference."""

import numpy as np
import pytest

from pyslice_tpu.analysis.ewr import iwfr_reconstruct
from pyslice_tpu.core.constants import wavelength
from pyslice_tpu.core.dtypes import DOUBLE
from pyslice_tpu.engine.ctem import focal_series
from pyslice_tpu.physics.aberrations import Aberrations
from tests.fixtures import hbn_thermal

LAM = wavelength(100e3)
DEFOCI = np.array([-320.0, -160.0, 0.0, 160.0, 320.0, 480.0])


def _axes(nx=64, ny=48, d=0.25):
    kxs = np.fft.fftfreq(nx, d)
    kys = np.fft.fftfreq(ny, d)
    return kxs, kys


def _smooth_wave(nx=64, ny=48, d=0.25, seed=0, phase_rms=0.4, amp_mod=0.15):
    """Band-limited complex wave: the kind of exit wave a thin specimen
    produces (smooth phase + mild amplitude modulation around 1)."""
    rng = np.random.default_rng(seed)
    kxs, kys = _axes(nx, ny, d)
    ksq = kxs[:, None] ** 2 + kys[None, :] ** 2
    env = np.exp(-ksq / (2 * 0.5 ** 2))          # ~0.5 1/A bandwidth

    def field(scale):
        f = rng.normal(size=(nx, ny)) + 1j * rng.normal(size=(nx, ny))
        r = np.real(np.fft.ifft2(np.fft.fft2(f) * env))
        return scale * r / r.std()

    return (1.0 + field(amp_mod)) * np.exp(1j * field(phase_rms))


def _align(rec, ref):
    """Remove the unobservable global phase."""
    return rec * np.exp(1j * np.angle(np.vdot(rec.ravel(), ref.ravel())))


class TestIWFR:
    def test_noiseless_roundtrip(self):
        psi = _smooth_wave()
        kxs, kys = _axes()
        imgs = np.asarray(focal_series(psi, DEFOCI, kxs, kys, lam=LAM,
                                       precision=DOUBLE))
        rec, errs = iwfr_reconstruct(imgs, DEFOCI, kxs, kys, lam=LAM,
                                     n_iters=300, precision=DOUBLE)
        rel = np.linalg.norm(_align(rec, psi) - psi) / np.linalg.norm(psi)
        assert rel < 1e-3, rel
        # residual history: strictly meaningful decrease, tiny at the end
        assert errs.shape == (300,)
        assert errs[-1] < errs[0] * 1e-6
        assert errs[-1] < 1e-10

    def test_reconstruction_reproduces_the_data(self):
        psi = _smooth_wave(seed=3)
        kxs, kys = _axes()
        ab = Aberrations(C3=0.5e7)
        imgs = np.asarray(focal_series(psi, DEFOCI, kxs, kys, lam=LAM,
                                       ab=ab, precision=DOUBLE))
        rec, _ = iwfr_reconstruct(imgs, DEFOCI, kxs, kys, lam=LAM, ab=ab,
                                  n_iters=400, precision=DOUBLE)
        re_imgs = np.asarray(focal_series(rec, DEFOCI, kxs, kys, lam=LAM,
                                          ab=ab, precision=DOUBLE))
        np.testing.assert_allclose(re_imgs, imgs, rtol=0, atol=1e-8)

    def test_multislice_exit_wave_roundtrip(self):
        """End-to-end against real physics: recover the multislice exit
        wave of a thermal hBN cell from its simulated focal series."""
        from pyslice_tpu.core.grids import grid_from_trajectory
        from pyslice_tpu.engine.pipeline import SimSpec, frame_exit_waves
        from pyslice_tpu.physics.potential import make_plan

        traj = hbn_thermal(n_frames=1, sigma=0.03, nx=2, ny=2)
        grid = grid_from_trajectory(traj, sampling=0.25,
                                    slice_thickness=0.5)
        plan = make_plan(grid.xs, grid.ys, grid.zs, traj.positions,
                         traj.atom_types)
        spec = SimSpec.create(grid, plan, 100e3)
        waves = np.ones((1, grid.nx, grid.ny), dtype=spec.precision.complex)
        kw = np.asarray(frame_exit_waves(traj.positions[0], waves,
                                         spec)[0, ..., -1])
        psi = np.fft.ifft2(np.fft.ifftshift(kw))

        imgs = np.asarray(focal_series(psi, DEFOCI, plan.kxs, plan.kys,
                                       lam=LAM, precision=DOUBLE))
        rec, errs = iwfr_reconstruct(imgs, DEFOCI, plan.kxs, plan.kys,
                                     lam=LAM, n_iters=400,
                                     precision=DOUBLE)
        rel = np.linalg.norm(_align(rec, psi) - psi) / np.linalg.norm(psi)
        assert rel < 5e-3, rel

    def test_aperture_recovers_bandlimited_wave(self):
        """With an objective aperture the detector never saw content
        outside it: the reconstruction matches the wave INSIDE the
        aperture and is zero outside."""
        psi = _smooth_wave(seed=5)
        kxs, kys = _axes()
        ap = 15.0                                   # mrad
        imgs = np.asarray(focal_series(psi, DEFOCI, kxs, kys, lam=LAM,
                                       aperture=ap, precision=DOUBLE))
        rec, _ = iwfr_reconstruct(imgs, DEFOCI, kxs, kys, lam=LAM,
                                  aperture=ap, n_iters=300,
                                  precision=DOUBLE)
        k_max = ap * 1e-3 / LAM
        inside = (kxs[:, None] ** 2 + kys[None, :] ** 2) <= k_max ** 2
        psi_bl_k = np.fft.fft2(psi) * inside
        rec_k = np.fft.fft2(_align(rec, np.fft.ifft2(psi_bl_k)))
        assert np.max(np.abs(rec_k[~inside])) < 1e-8
        rel = np.linalg.norm(rec_k[inside] - psi_bl_k[inside]) \
            / np.linalg.norm(psi_bl_k[inside])
        assert rel < 2e-2, rel

    def test_finite_dose_degrades_gracefully(self):
        """Shot-noised focal series: at a realistic HRTEM dose the
        reconstruction still tracks the truth; the residual floor scales
        with the noise instead of diverging."""
        from pyslice_tpu.analysis.detectors import apply_shot_noise

        psi = _smooth_wave(seed=13)
        kxs, kys = _axes()
        imgs = np.asarray(focal_series(psi, DEFOCI, kxs, kys, lam=LAM,
                                       precision=DOUBLE))
        # HRTEM doses are ~1e3-1e4 e/A^2; pixel area d^2 = 0.0625 A^2.
        counts = apply_shot_noise(imgs, dose=2e4, pixel_area=0.0625,
                                  seed=1)
        noisy = np.maximum(np.asarray(counts, np.float64), 0.0) \
            / (2e4 * 0.0625)
        rec, errs = iwfr_reconstruct(noisy, DEFOCI, kxs, kys, lam=LAM,
                                     n_iters=200, precision=DOUBLE)
        rel = np.linalg.norm(_align(rec, psi) - psi) / np.linalg.norm(psi)
        assert rel < 0.1, rel                     # tracks the truth
        assert np.isfinite(errs).all() and errs[-1] < errs[0]

    def test_custom_init_and_validation(self):
        psi = _smooth_wave(seed=7)
        kxs, kys = _axes()
        imgs = np.asarray(focal_series(psi, DEFOCI, kxs, kys, lam=LAM,
                                       precision=DOUBLE))
        # warm start from the truth: residual immediately ~0
        _, errs = iwfr_reconstruct(imgs, DEFOCI, kxs, kys, lam=LAM,
                                   n_iters=2, init=psi, precision=DOUBLE)
        assert errs[0] < 1e-12
        with pytest.raises(ValueError, match="defoci"):
            iwfr_reconstruct(imgs, DEFOCI[:-1], kxs, kys, lam=LAM)
        with pytest.raises(ValueError, match="n_planes"):
            iwfr_reconstruct(imgs[0], DEFOCI, kxs, kys, lam=LAM)
        with pytest.raises(ValueError, match=">= 0"):
            iwfr_reconstruct(-imgs, DEFOCI, kxs, kys, lam=LAM)
        with pytest.raises(ValueError, match="init shape"):
            iwfr_reconstruct(imgs, DEFOCI, kxs, kys, lam=LAM,
                             init=psi[:-1])


class TestFocalSeries:
    def test_matches_single_plane_images(self):
        from pyslice_tpu.engine.ctem import image_from_exit_wave
        psi = _smooth_wave(seed=9)
        kxs, kys = _axes()
        ab = Aberrations(C1=-100.0, C3=1.0e7)
        stack = np.asarray(focal_series(psi, DEFOCI, kxs, kys, lam=LAM,
                                        ab=ab, precision=DOUBLE))
        for i, d in enumerate(DEFOCI):
            one = np.asarray(image_from_exit_wave(
                psi, kxs, kys, lam=LAM,
                ab=Aberrations(C1=-100.0 + d, C3=1.0e7),
                precision=DOUBLE))
            np.testing.assert_allclose(stack[i], one, rtol=1e-10)

    def test_input_space_and_shape_validation(self):
        psi = _smooth_wave(seed=11)
        kxs, kys = _axes()
        a = np.asarray(focal_series(psi, [0.0, 100.0], kxs, kys, lam=LAM,
                                    precision=DOUBLE))
        b = np.asarray(focal_series(np.fft.fft2(psi), [0.0, 100.0], kxs,
                                    kys, lam=LAM, input_space="k",
                                    precision=DOUBLE))
        np.testing.assert_allclose(a, b, rtol=1e-10)
        with pytest.raises(ValueError, match="input_space"):
            focal_series(psi, [0.0], kxs, kys, lam=LAM, input_space="bad")
        with pytest.raises(ValueError, match="2-D"):
            focal_series(psi[None], [0.0], kxs, kys, lam=LAM)

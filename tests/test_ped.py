"""Precession electron diffraction (engine.ped) — beyond-reference."""

import numpy as np
import pytest

from pyslice_tpu.engine.ped import precession_diffraction, precession_tilts
from pyslice_tpu.engine.thermal import frozen_phonon_diffraction
from tests.fixtures import hbn_stack

KW = dict(n_configs=2, sigma=0.05, seed=3, voltage_eV=100e3,
          sampling=0.35, slice_thickness=1.5)


@pytest.fixture(scope="module")
def traj():
    # 3 layers in separate slices: tilt/precession are pure k-space
    # phases, so only a multi-slice (dynamical) specimen responds.
    return hbn_stack(3, 2, 2)


class TestTilts:
    def test_ring_geometry(self):
        t = precession_tilts(20.0, 8)
        assert t.shape == (8, 2)
        np.testing.assert_allclose(np.hypot(t[:, 0], t[:, 1]), 20.0)
        np.testing.assert_allclose(t.mean(axis=0), 0.0, atol=1e-12)
        np.testing.assert_allclose(t[0], [20.0, 0.0])

    def test_degenerate_and_validation(self):
        t = precession_tilts(0.0, 12)
        np.testing.assert_array_equal(t, [[0.0, 0.0]])
        with pytest.raises(ValueError, match=">= 0"):
            precession_tilts(-1.0)
        with pytest.raises(ValueError, match="azimuth"):
            precession_tilts(10.0, 0)


class TestPED:
    def test_zero_angle_is_axial(self, traj):
        ped = precession_diffraction(traj, 0.0, n_azimuth=6, **KW)
        axial = frozen_phonon_diffraction(traj, **KW)
        np.testing.assert_allclose(ped, axial, rtol=1e-6)

    def test_matches_manual_azimuth_average(self, traj):
        n_az = 4
        ped = precession_diffraction(traj, 15.0, n_azimuth=n_az, **KW)
        want = np.mean([
            frozen_phonon_diffraction(traj, tilt=(float(tx), float(ty)),
                                      **KW)
            for tx, ty in precession_tilts(15.0, n_az)], axis=0)
        np.testing.assert_allclose(ped, want, rtol=1e-6)
        # and precession actually changes the dynamical pattern — at a
        # cone angle whose interlayer advection is ~a pixel (150 mrad x
        # 3.39 A spacing ~ 0.5 A; measured 2.3e-4 max relative change on
        # this 3-layer stack, scaling ~theta^2 below that)
        big = precession_diffraction(traj, 150.0, n_azimuth=3, **KW)
        axial = frozen_phonon_diffraction(traj, **KW)
        rel = (np.abs(big - axial).max() / axial.max())
        assert rel > 1e-4

    def test_intensity_conserved(self, traj):
        """The tilted propagator is unitary (pure phase), so the total
        diffracted intensity is tilt-independent."""
        ped = precession_diffraction(traj, 15.0, n_azimuth=3, **KW)
        axial = frozen_phonon_diffraction(traj, **KW)
        assert np.sum(ped) == pytest.approx(np.sum(axial), rel=1e-6)

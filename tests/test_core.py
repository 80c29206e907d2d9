"""Constants, grids, Kirkland parsing."""

import numpy as np
import pytest

from pyslice_tpu.core import constants
from pyslice_tpu.core.grids import Grid, grid_from_box, gridFromTrajectory
from pyslice_tpu.physics import kirkland
from tests.fixtures import hbn_monolayer


class TestConstants:
    def test_wavelength_known_values(self):
        # Textbook relativistic electron wavelengths (Kirkland Table 2.1).
        assert constants.wavelength(100e3) == pytest.approx(0.037014, rel=1e-3)
        assert constants.wavelength(60e3) == pytest.approx(0.048659, rel=1e-3)
        assert constants.wavelength(300e3) == pytest.approx(0.019687, rel=1e-3)

    def test_interaction_parameter_positive_decreasing(self):
        s100 = constants.interaction_parameter(100e3)
        s300 = constants.interaction_parameter(300e3)
        assert s100 > s300 > 0

    def test_m_effective(self):
        assert constants.m_effective(0) == pytest.approx(constants.M_ELECTRON)
        assert constants.m_effective(511e3) == pytest.approx(
            2 * constants.M_ELECTRON, rel=1e-2)


class TestGrids:
    def test_point_count_rule(self):
        g = grid_from_box(10.0, 7.3, 5.0, sampling=0.1, slice_thickness=0.5)
        # exact reference expression: int(l / s) + 1 (float division quirks
        # included)
        assert (g.nx, g.ny, g.nz) == (int(10.0 / 0.1) + 1, int(7.3 / 0.1) + 1,
                                      int(5.0 / 0.5) + 1)
        # endpoint=False: last point is below the box length
        assert g.xs[0] == 0.0 and g.xs[-1] < 10.0
        assert g.dx == pytest.approx(10.0 / 101)

    def test_nominal_vs_physical_k_axes_quirk(self):
        g = grid_from_box(10.0, 10.0, 5.0, sampling=0.1, slice_thickness=0.5)
        nominal = g.kxs_nominal_shifted()
        physical = np.fft.fftshift(g.kxs())
        # The reference exports fftfreq(n, requested_sampling); the physics
        # uses fftfreq(n, actual_pitch). They differ by ~n/(n*sampling/l).
        assert not np.allclose(nominal, physical)
        assert np.allclose(nominal * (g.sampling / g.dx), physical)

    def test_reference_facade(self):
        traj = hbn_monolayer()
        xs, ys, zs, lx, ly, lz = gridFromTrajectory(traj, 0.1, 0.5)
        assert lx == pytest.approx(2 * 2.504)
        assert len(zs) == int(lz / 0.5) + 1


class TestKirkland:
    def test_parse_shape_and_values(self):
        p = kirkland.load_parameters()
        assert p.shape == (103, 3, 4)
        # Hand-checked first row of hydrogen from the published table:
        # a1 b1 a2 b2 = 4.20298324e-3 2.25350888e-1 6.27762505e-2 2.25366950e-1
        assert p[0, 0, 0] == pytest.approx(4.20298324e-3)
        assert p[0, 0, 1] == pytest.approx(2.25350888e-1)
        assert p[0, 1, 0] == pytest.approx(6.27762505e-2)   # a2
        assert p[0, 1, 1] == pytest.approx(2.25366950e-1)   # b2
        # c1 d1 sit in row 2 of the raw block: 6.77756695e-2 4.38854001e0
        assert p[0, 0, 2] == pytest.approx(6.77756695e-2)
        assert p[0, 0, 3] == pytest.approx(4.38854001e0)
        # Element 103 parses (the reference's loadtxt off-by-one zeroed it).
        assert p[102].any()

    def test_form_factor_matches_oracle(self):
        qsq = np.linspace(0, 4, 64).reshape(8, 8)
        for z in (1, 5, 7, 79):
            got = np.asarray(kirkland.form_factor(qsq, z,
                                                  dtype=np.float64))
            want = kirkland.form_factor_np(qsq, z)
            np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_form_factor_vectorized_over_z(self):
        qsq = np.linspace(0, 2, 16).reshape(4, 4)
        out = np.asarray(kirkland.form_factor(qsq, np.array([5, 7]),
                                              dtype=np.float64))
        assert out.shape == (2, 4, 4)
        np.testing.assert_allclose(out[0], kirkland.form_factor_np(qsq, 5),
                                   rtol=1e-12)

    def test_form_factor_decreasing(self):
        qsq = np.array([[0.0, 1.0, 10.0, 100.0]])
        f = kirkland.form_factor_np(qsq, 6)[0]
        assert np.all(np.diff(f) < 0)

    def test_element_table(self):
        assert kirkland.element_to_z("H") == 1
        assert kirkland.element_to_z("Ti") == 22
        assert kirkland.element_to_z("Tl") == 81     # reference bug #2 fixed
        assert kirkland.element_to_z("Og") == 118
        assert kirkland.z_to_element(81) == "Tl"
        with pytest.raises(ValueError):
            kirkland.element_to_z("Tl", compat_reference_tl=True)


class TestFastGrid:
    def test_snaps_to_128(self):
        g = grid_from_box(10.0, 7.3, 5.0, sampling=0.1, slice_thickness=0.5,
                          fast_grid=True)
        assert g.nx % 128 == 0 and g.ny % 128 == 0
        assert g.nx >= int(10.0 / 0.1) + 1     # never coarser than requested
        assert g.xs[0] == 0.0 and g.xs[-1] < 10.0
        # default remains reference-exact
        g2 = grid_from_box(10.0, 7.3, 5.0, sampling=0.1, slice_thickness=0.5)
        assert g2.nx == int(10.0 / 0.1) + 1

    def test_exported_k_axes_use_actual_pitch(self):
        """With fast_grid the actual pitch differs from the requested
        sampling; exported k axes (and thus HAADF masks / dispersion k
        lookups) must reflect the physical pitch, not the request."""
        g = grid_from_box(10.0, 7.3, 5.0, sampling=0.1, slice_thickness=0.5,
                          fast_grid=True)
        assert g.fast_grid
        np.testing.assert_allclose(g.kxs_nominal_shifted(),
                                   np.fft.fftshift(np.fft.fftfreq(g.nx, g.dx)))
        np.testing.assert_allclose(g.kys_nominal_shifted(),
                                   np.fft.fftshift(np.fft.fftfreq(g.ny, g.dy)))
        # without fast_grid the reference quirk (#12) is preserved verbatim
        g2 = grid_from_box(10.0, 7.3, 5.0, sampling=0.1, slice_thickness=0.5)
        assert not g2.fast_grid
        np.testing.assert_allclose(
            g2.kxs_nominal_shifted(),
            np.fft.fftshift(np.fft.fftfreq(g2.nx, 0.1)))
        # fast_grid that happens to change nothing keeps parity axes
        g3 = grid_from_box(12.75, 12.75, 5.0, sampling=0.1,
                           slice_thickness=0.5, fast_grid=True)
        assert g3.nx == 128 and not g3.fast_grid

"""Oblique (triclinic in-plane) cell support vs an independent oracle.

The implementation paints atoms in FRACTIONAL coordinates against integer
frequencies and carries the oblique metric through form factors, the
Fresnel propagator, probe construction, and analysis masks. The oracle here
works entirely in CARTESIAN coordinates with explicit reciprocal-lattice
vectors k_mn = m b1 + n b2 and direct (non-FFT) mode sums — an independent
derivation of the same physics.
"""

import numpy as np
import pytest

from pyslice_tpu.core.dtypes import DOUBLE
from pyslice_tpu.core.grids import grid_from_box, grid_from_box_matrix
from pyslice_tpu.data.trajectory import Trajectory
from pyslice_tpu.engine.calculator import MultisliceCalculator
from pyslice_tpu.physics import kirkland
from pyslice_tpu.physics.potential import make_plan, rasterize, slice_edges
from pyslice_tpu.physics.propagate import multislice
from pyslice_tpu.utils.host import to_numpy

# a deliberately ugly oblique cell (columns a1, a2)
A2D = np.array([[6.4, 2.1],
                [0.0, 5.7]])
LZ = 3.0


def _kvecs(nx, ny):
    B = np.linalg.inv(A2D).T           # columns b1, b2 (cycles/Angstrom)
    m = np.rint(np.fft.fftfreq(nx) * nx)
    n = np.rint(np.fft.fftfreq(ny) * ny)
    kv = (m[:, None, None] * B[:, 0][None, None, :]
          + n[None, :, None] * B[:, 1][None, None, :])   # (nx, ny, 2)
    return kv


def _sample_points(nx, ny):
    fi = np.arange(nx) / nx
    fj = np.arange(ny) / ny
    return (fi[:, None, None] * A2D[:, 0][None, None, :]
            + fj[None, :, None] * A2D[:, 1][None, None, :])


def _oracle_potential(pos, Zs, nx, ny, zs):
    """Direct Cartesian mode sums, no FFTs, no fractional coordinates."""
    kv = _kvecs(nx, ny)
    qsq = np.sum(kv ** 2, axis=-1)
    r = _sample_points(nx, ny)
    px_area = abs(np.linalg.det(A2D)) / (nx * ny)
    dzv = zs[1] - zs[0] if len(zs) > 1 else 0.5
    edges = slice_edges(zs, dzv)
    out = np.zeros((nx, ny, len(zs)))
    for s in range(len(zs)):
        recip = np.zeros((nx, ny), dtype=complex)
        for p, Z in zip(pos, Zs):
            if not (edges[s] <= p[2] < edges[s + 1]):
                continue
            phase = -2j * np.pi * (kv[..., 0] * p[0] + kv[..., 1] * p[1])
            recip += np.exp(phase) * kirkland.form_factor_np(qsq, int(Z))
        # inverse transform: V(r_ij) = (1/N) sum_mn recip e^{+2pi i k.r}
        for i in range(nx):
            for j in range(ny):
                ph = 2j * np.pi * (kv[..., 0] * r[i, j, 0]
                                   + kv[..., 1] * r[i, j, 1])
                out[i, j, s] = np.real(np.sum(recip * np.exp(ph))) / (nx * ny)
    return out / px_area ** 2


@pytest.fixture(scope="module")
def oblique_setup():
    rng = np.random.default_rng(7)
    n_atoms = 3
    frac = rng.random((n_atoms, 2))
    pos = np.zeros((n_atoms, 3))
    pos[:, :2] = frac @ A2D.T                       # Cartesian in the cell
    pos[:, 2] = [0.4, 1.1, 2.2]
    Zs = np.array([5, 7, 5])
    box = np.zeros((3, 3))
    box[:2, :2] = A2D
    box[2, 2] = LZ
    grid = grid_from_box_matrix(box, sampling=0.8, slice_thickness=1.0)
    return pos, Zs, box, grid


class TestObliqueGrid:
    def test_orthogonal_reduction(self):
        box = np.diag([6.4, 5.7, 3.0])
        g1 = grid_from_box_matrix(box, 0.5, 1.0)
        g2 = grid_from_box(6.4, 5.7, 3.0, 0.5, 1.0)
        assert not g1.is_oblique
        np.testing.assert_array_equal(g1.xs, g2.xs)
        np.testing.assert_allclose(g1.ksq2d(),
                                   np.add.outer(g1.kxs() ** 2, g1.kys() ** 2))

    def test_out_of_plane_tilt_rejected(self):
        box = np.diag([6.0, 5.0, 3.0])
        box[0, 2] = 0.5
        with pytest.raises(ValueError, match="out-of-plane"):
            grid_from_box_matrix(box)

    def test_metric(self, oblique_setup):
        _, _, _, grid = oblique_setup
        kv = _kvecs(grid.nx, grid.ny)
        np.testing.assert_allclose(grid.ksq2d(), np.sum(kv ** 2, axis=-1),
                                   rtol=1e-12)
        np.testing.assert_allclose(grid.sample_points_2d(),
                                   _sample_points(grid.nx, grid.ny))
        # pixel area = |det A| / N
        assert grid.pixel_area == pytest.approx(
            abs(np.linalg.det(A2D)) / (grid.nx * grid.ny))


class TestObliquePotential:
    def test_vs_cartesian_oracle(self, oblique_setup):
        pos, Zs, box, grid = oblique_setup
        plan = make_plan(grid.xs, grid.ys, grid.zs, pos, Zs,
                         cell2d=grid.cell2d)
        got = to_numpy(rasterize(pos, plan, DOUBLE)).transpose(1, 2, 0)
        want = _oracle_potential(pos, Zs, grid.nx, grid.ny, grid.zs)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-10

    def test_orthogonal_cell2d_matches_plain(self):
        """cell2d = diag must reproduce the orthogonal code path."""
        rng = np.random.default_rng(3)
        pos = rng.random((4, 3)) * np.array([6.4, 5.7, 2.5])
        Zs = np.array([5, 7, 5, 7])
        g = grid_from_box(6.4, 5.7, 3.0, 0.8, 1.0)
        p1 = make_plan(g.xs, g.ys, g.zs, pos, Zs)
        p2 = make_plan(g.xs, g.ys, g.zs, pos, Zs,
                       cell2d=np.diag([6.4, 5.7]))
        v1 = to_numpy(rasterize(pos, p1, DOUBLE))
        v2 = to_numpy(rasterize(pos, p2, DOUBLE))
        np.testing.assert_allclose(v2, v1, rtol=1e-9, atol=1e-12)


class TestObliquePropagate:
    def test_one_step_vs_cartesian_oracle(self, oblique_setup):
        """ifft(P * fft(psi)) with the oblique metric vs direct mode sums."""
        pos, Zs, box, grid = oblique_setup
        nx, ny = grid.nx, grid.ny
        rng = np.random.default_rng(1)
        psi = (rng.standard_normal((1, nx, ny))
               + 1j * rng.standard_normal((1, nx, ny)))
        pot = np.zeros((2, nx, ny))        # 2 vacuum slices: pure Fresnel
        eV, lam_dz = 100e3, None
        from pyslice_tpu.core.constants import wavelength
        lam = wavelength(eV)
        dzv = float(grid.zs[1] - grid.zs[0])
        got = np.asarray(multislice(
            psi.astype(np.complex128), pot, grid.kxs(), grid.kys(),
            eV=eV, dz=dzv, precision="double", ksq=grid.ksq2d()))

        kv = _kvecs(nx, ny)
        qsq = np.sum(kv ** 2, axis=-1)
        P = np.exp(-1j * np.pi * lam * dzv * qsq)
        # direct DFT pair in fractional index space equals FFT; the METRIC
        # is what the oracle checks
        want = np.fft.ifft2(P * np.fft.fft2(psi[0]))
        assert np.abs(got[0] - want).max() / np.abs(want).max() < 1e-12

    def test_vacuum_identity_and_unitarity(self, oblique_setup):
        pos, Zs, box, grid = oblique_setup
        nx, ny = grid.nx, grid.ny
        psi = np.ones((1, nx, ny), dtype=np.complex128)
        pot = np.zeros((3, nx, ny))
        out = np.asarray(multislice(psi, pot, grid.kxs(), grid.kys(),
                                    eV=100e3, dz=1.0, precision="double",
                                    ksq=grid.ksq2d()))
        np.testing.assert_allclose(out, psi, atol=1e-12)


class TestObliqueEndToEnd:
    def test_calculator_oblique(self, oblique_setup):
        pos, Zs, box, grid = oblique_setup
        traj = Trajectory(Zs, pos[None], np.zeros((1,) + pos.shape), box,
                          0.005).generate_random_displacements(3, 0.03,
                                                               seed=0)
        calc = MultisliceCalculator(precision=DOUBLE)
        calc.setup(traj, aperture=20.0, voltage_eV=100e3, sampling=0.8,
                   slice_thickness=1.0, use_cache=False,
                   probe_positions=[(1.0, 1.0), (3.0, 2.0)])
        wf = calc.run(progress=False)
        assert wf.ksq_shifted is not None
        assert np.all(np.isfinite(np.abs(wf.wavefunction_data)))
        from pyslice_tpu.analysis.tacaw import TACAWData
        from pyslice_tpu.analysis.haadf import HAADFData
        spec = TACAWData(wf).spectrum()
        assert np.all(np.isfinite(spec)) and spec.shape == (3,)
        adf = HAADFData(wf).calculateADF(collection_angle=30)
        assert np.all(np.isfinite(adf))

    def test_norm_conserved_with_atoms(self, oblique_setup):
        pos, Zs, box, grid = oblique_setup
        nx, ny = grid.nx, grid.ny
        plan = make_plan(grid.xs, grid.ys, grid.zs, pos, Zs,
                         cell2d=grid.cell2d)
        pot = to_numpy(rasterize(pos, plan, DOUBLE))
        rng = np.random.default_rng(2)
        psi = (rng.standard_normal((1, nx, ny))
               + 1j * rng.standard_normal((1, nx, ny)))
        out = np.asarray(multislice(psi.astype(np.complex128), pot,
                                    grid.kxs(), grid.kys(), eV=100e3,
                                    dz=float(grid.zs[1] - grid.zs[0]),
                                    precision="double", ksq=grid.ksq2d()))
        n_in = np.sum(np.abs(psi) ** 2)
        n_out = np.sum(np.abs(out) ** 2)
        assert abs(n_out - n_in) / n_in < 1e-12

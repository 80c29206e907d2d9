"""Physics kernels vs the NumPy oracle + invariants.

Covers the reference regression scope of 00_probe / 01_potentials /
02_propagate / 03_manyprobes / 07_defocus with the same scale-invariant
residual oracle (dz <= 1e-6), plus property tests the reference lacks.
"""

import numpy as np
import pytest

from pyslice_tpu.core.dtypes import DOUBLE, SINGLE
from pyslice_tpu.core.grids import grid_from_trajectory
from pyslice_tpu.physics.potential import Potential, make_plan, rasterize
from pyslice_tpu.physics.probe import (Probe, create_batched_probes, defocus,
                                       probe_array, probe_grid, shift_probes)
from pyslice_tpu.physics.propagate import Propagate, multislice
from pyslice_tpu.utils.host import to_numpy
from tests import oracle
from tests.fixtures import hbn_monolayer, hbn_thermal

TOL = 1e-6   # the reference's regression bar


@pytest.fixture(scope="module")
def setup():
    traj = hbn_monolayer(2, 2)
    g = grid_from_trajectory(traj, sampling=0.2, slice_thickness=0.8)
    return traj, g


class TestProbe:
    def test_plane_wave(self, setup):
        _, g = setup
        p = probe_array(g.xs, g.ys, 0, 100e3, DOUBLE)
        np.testing.assert_array_equal(to_numpy(p), np.ones((g.nx, g.ny)))

    @pytest.mark.parametrize("mrad", [1, 3, 5, 15, 30])
    def test_aperture_vs_oracle(self, setup, mrad):
        _, g = setup
        got = to_numpy(probe_array(g.xs, g.ys, mrad, 100e3, DOUBLE))
        want = oracle.oracle_probe(g.xs, g.ys, mrad, 100e3)
        assert oracle.residual(got, want) < 1e-20

    def test_nonsquare_grid(self):
        # reference test 00 uses 501x491; scaled-down non-square grid here
        xs = np.linspace(0, 50, 51)
        ys = np.linspace(0, 49, 45)
        got = to_numpy(probe_array(xs, ys, 5, 100e3, DOUBLE))
        want = oracle.oracle_probe(xs, ys, 5, 100e3)
        assert got.shape == (51, 45)
        assert oracle.residual(got, want) < 1e-20

    def test_single_precision_residual(self, setup):
        _, g = setup
        got = to_numpy(probe_array(g.xs, g.ys, 30, 100e3, SINGLE))
        want = oracle.oracle_probe(g.xs, g.ys, 30, 100e3)
        assert oracle.residual(got, want) < TOL

    def test_shift_vs_oracle(self, setup):
        _, g = setup
        base = oracle.oracle_probe(g.xs, g.ys, 10, 100e3)
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        positions = [(1.0, 2.0), (2.5, 0.7), (0.33, 4.4)]
        got = to_numpy(shift_probes(base, kxs, kys, positions, DOUBLE))
        want = oracle.oracle_shift(base, kxs, kys, positions)
        assert oracle.residual(got, want) < 1e-20

    def test_shift_moves_peak(self, setup):
        """Probe-position semantics (reference parity, ledger quirk #14):
        the k-space ramp exp(+2*pi*i k.p) displaces the mid-grid base probe
        by MINUS p (periodically wrapped) — positions act as self-consistent
        labels, not absolute coordinates."""
        _, g = setup
        p = Probe(g.xs, g.ys, 25, 100e3, precision=DOUBLE)
        base = np.abs(p.to_cpu())
        bx, by = np.unravel_index(np.argmax(base), base.shape)
        shift = (g.xs[g.nx // 3], g.ys[g.ny // 4])
        b = create_batched_probes(p, [shift])
        arr = np.abs(to_numpy(b.array)[0])
        ix, iy = np.unravel_index(np.argmax(arr), arr.shape)
        got_dx = (g.xs[bx] - g.xs[ix]) % g.lx
        got_dy = (g.ys[by] - g.ys[iy]) % g.ly
        assert abs(got_dx - shift[0]) <= 2 * g.dx
        assert abs(got_dy - shift[1]) <= 2 * g.dy

    def test_defocus_roundtrip_and_oracle(self, setup):
        _, g = setup
        p = probe_array(g.xs, g.ys, 10, 100e3, DOUBLE)
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        lam = 0.037014
        d1 = defocus(p, kxs, kys, lam, 100.0, DOUBLE)
        d2 = defocus(d1, kxs, kys, lam, -100.0, DOUBLE)
        assert oracle.residual(to_numpy(d2), to_numpy(p)) < 1e-20
        # forward defocus == oracle Fresnel multiply
        P = np.exp(-1j * np.pi * lam * 100.0
                   * (kxs[:, None] ** 2 + kys[None, :] ** 2))
        want = np.fft.ifft2(np.fft.fft2(to_numpy(p)) * P)
        assert oracle.residual(to_numpy(d1), want) < 1e-20

    def test_probe_grid_ordering(self):
        pg = probe_grid([0, 1], [0, 2], 2, 3)
        assert pg.shape == (6, 2)
        # x varies fastest (meshgrid 'xy' flatten)
        np.testing.assert_allclose(pg[0], [0, 0])
        np.testing.assert_allclose(pg[1], [1, 0])
        np.testing.assert_allclose(pg[2], [0, 1])


class TestPotential:
    def test_vs_oracle_double(self, setup):
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        want = oracle.oracle_potential(g.xs, g.ys, g.zs, traj.positions[0],
                                       traj.atom_types)
        got = pot.to_cpu()
        assert got.shape == want.shape
        assert oracle.residual(got, want) < 1e-18

    def test_vs_oracle_single(self, setup):
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=SINGLE)
        want = oracle.oracle_potential(g.xs, g.ys, g.zs, traj.positions[0],
                                       traj.atom_types)
        assert oracle.residual(pot.to_cpu(), want) < TOL

    def test_string_atom_types(self, setup):
        traj, g = setup
        names = np.array(["B" if z == 5 else "N" for z in traj.atom_types])
        pot_s = Potential(g.xs, g.ys, g.zs, traj.positions[0], names,
                          precision=DOUBLE)
        pot_z = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                          traj.atom_types, precision=DOUBLE)
        np.testing.assert_allclose(pot_s.to_cpu(), pot_z.to_cpu())

    def test_gauss_kind(self, setup):
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, kind="gauss", precision=DOUBLE)
        want = oracle.oracle_potential(g.xs, g.ys, g.zs, traj.positions[0],
                                       traj.atom_types, kind="gauss")
        assert oracle.residual(pot.to_cpu(), want) < 1e-18

    def test_binning_edges(self):
        """Atoms at bin boundaries and outside the box follow the reference
        rules: [coord-d/2, coord+d/2), bin 0 from 0, last bin +d."""
        xs = ys = np.linspace(0, 4, 8, endpoint=False)
        zs = np.linspace(0, 3, 3, endpoint=False)   # coords 0, 1, 2; d=1
        types = np.array([5])

        def slice_of(zpos):
            pot = Potential(xs, ys, zs, np.array([[1.0, 1.0, zpos]]), types,
                            precision=DOUBLE).to_cpu()
            per_slice = np.abs(pot).sum(axis=(0, 1))
            return int(np.argmax(per_slice)) if per_slice.sum() > 0 else None

        assert slice_of(0.0) == 0
        assert slice_of(0.49) == 0
        assert slice_of(0.5) == 1      # boundary goes up
        assert slice_of(1.49) == 1
        assert slice_of(2.9) == 2      # last bin extended to coord+d=3
        assert slice_of(-0.1) is None  # below 0: excluded
        assert slice_of(3.0) is None   # beyond last bin: excluded

    def test_many_frames_plan(self):
        """A plan built from all frames covers every frame's occupancy."""
        traj = hbn_thermal(6, 0.3)
        g = grid_from_trajectory(traj, sampling=0.25, slice_thickness=0.8)
        plan = make_plan(g.xs, g.ys, g.zs, traj.positions, traj.atom_types)
        for f in range(traj.n_frames):
            got = to_numpy(rasterize(traj.positions[f], plan, DOUBLE))
            want = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[f],
                                           traj.atom_types)
            assert oracle.residual(got.transpose(1, 2, 0), want) < 1e-18

    def test_uncovered_frame_poisons_and_validates(self, setup):
        """A frame outside the plan's (type, slice) occupancy or capacity
        must NaN-poison rather than silently drop atoms; validate_frame
        gives the actionable error (ADVICE round-1 finding)."""
        from pyslice_tpu.physics.potential import validate_frame
        traj, g = setup
        plan = make_plan(g.xs, g.ys, g.zs, traj.positions[0],
                         traj.atom_types)
        # covered frame: finite output, validator passes
        ok = to_numpy(rasterize(traj.positions[0], plan, DOUBLE))
        assert np.all(np.isfinite(ok))
        validate_frame(traj.positions[0], plan)
        # move every atom to the last slice -> unplanned bins + overflow
        bad = np.array(traj.positions[0])
        bad[:, 2] = float(g.zs[-1]) + 0.1
        with pytest.raises(ValueError, match="rasterizer plan"):
            validate_frame(bad, plan)
        poisoned = to_numpy(rasterize(bad, plan, DOUBLE))
        assert np.all(np.isnan(poisoned))

    def test_slice_axis_0(self, setup):
        """slice_axis=0: slices along the first grid axis, in-plane =
        (positions[:,1], positions[:,2]) painted on the (xs, ys) k grid —
        reference semantics (potentials.py:232-245)."""
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, slice_axis=0, precision=DOUBLE)
        want = oracle.oracle_potential(g.xs, g.ys, g.zs, traj.positions[0],
                                       traj.atom_types, slice_axis=0)
        assert pot.to_cpu().shape == (g.nx, g.ny, g.nx)
        assert oracle.residual(pot.to_cpu(), want) < 1e-18


class TestPropagate:
    def test_vs_oracle_double(self, setup):
        traj, g = setup
        probe = Probe(g.xs, g.ys, 5, 100e3, precision=DOUBLE)
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        got = to_numpy(Propagate(probe, pot))
        want_pot = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[0],
                                           traj.atom_types)
        want = oracle.oracle_propagate(oracle.oracle_probe(g.xs, g.ys, 5, 100e3),
                                       want_pot, g.xs, g.ys, g.zs, 100e3)
        assert oracle.residual(got, want) < 1e-18

    def test_single_precision_residual(self, setup):
        traj, g = setup
        probe = Probe(g.xs, g.ys, 5, 100e3, precision=SINGLE)
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=SINGLE)
        got = to_numpy(Propagate(probe, pot))
        want_pot = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[0],
                                           traj.atom_types)
        want = oracle.oracle_propagate(oracle.oracle_probe(g.xs, g.ys, 5, 100e3),
                                       want_pot, g.xs, g.ys, g.zs, 100e3)
        assert oracle.residual(got, want) < TOL

    def test_batch_vs_single(self, setup):
        """Batched propagation must equal per-probe propagation."""
        traj, g = setup
        base = Probe(g.xs, g.ys, 20, 100e3, precision=DOUBLE)
        positions = [(1.0, 1.0), (2.0, 3.0), (3.3, 0.4)]
        batch = create_batched_probes(base, positions)
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        got = to_numpy(Propagate(batch, pot))
        assert got.shape[0] == 3
        for i in range(3):
            single = Probe(g.xs, g.ys, 20, 100e3,
                           array=to_numpy(batch.array)[i], precision=DOUBLE)
            want = to_numpy(Propagate(single, pot))
            assert oracle.residual(got[i], want) < 1e-20

    def test_norm_conservation(self, setup):
        traj, g = setup
        probe = Probe(g.xs, g.ys, 15, 100e3, precision=DOUBLE)
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        out = to_numpy(Propagate(probe, pot))
        n_in = np.sum(np.abs(probe.to_cpu()) ** 2)
        n_out = np.sum(np.abs(out) ** 2)
        assert n_out == pytest.approx(n_in, rel=1e-10)

    def test_record_layers(self, setup):
        """Snapshot at slice s == full propagation through potential[:s+1]."""
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        probe = Probe(g.xs, g.ys, 5, 100e3, precision=DOUBLE)
        psi = probe.array[None]
        layers = (1, 3, g.nz - 1)
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        out = to_numpy(multislice(psi, pot.array_szy, kxs, kys, eV=100e3,
                                  dz=g.dz, record_layers=layers,
                                  precision=DOUBLE))
        assert out.shape[0] == 3
        want_pot = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[0],
                                           traj.atom_types)
        base = oracle.oracle_probe(g.xs, g.ys, 5, 100e3)
        for i, layer in enumerate(layers):
            want = oracle.oracle_propagate(base, want_pot[:, :, :layer + 1],
                                           g.xs, g.ys, g.zs, 100e3)
            assert oracle.residual(out[i, 0], want) < 1e-18


class TestBandwidthLimit:
    """Antialiasing band limit (beyond-reference; Kirkland temsim's 2/3
    convention): the Fresnel multiplier is zeroed outside the band on
    every kernel path, at zero per-step cost."""

    def test_vs_masked_oracle(self, setup):
        traj, g = setup
        from pyslice_tpu.physics.propagate import bandwidth_kmax2
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        kmax2 = bandwidth_kmax2(kxs, kys, 2.0 / 3.0)
        nyq = min(np.max(np.abs(kxs)), np.max(np.abs(kys)))
        assert kmax2 == pytest.approx(((2.0 / 3.0) * nyq) ** 2)

        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        probe = Probe(g.xs, g.ys, 15, 100e3, precision=DOUBLE)
        got = to_numpy(multislice(probe.array[None], pot.array_szy, kxs,
                                  kys, eV=100e3, dz=g.dz, precision=DOUBLE,
                                  bandwidth_limit=2.0 / 3.0))[0]
        want_pot = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[0],
                                           traj.atom_types)
        want = oracle.oracle_propagate(
            oracle.oracle_probe(g.xs, g.ys, 15, 100e3), want_pot,
            g.xs, g.ys, g.zs, 100e3, kmax2=kmax2)
        assert oracle.residual(got, want) < 1e-18
        # and it actually does something: differs from the unlimited run
        full = oracle.oracle_propagate(
            oracle.oracle_probe(g.xs, g.ys, 15, 100e3), want_pot,
            g.xs, g.ys, g.zs, 100e3)
        assert oracle.residual(got, full) > 1e-12

    def test_record_layers_with_band_limit(self, setup):
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        probe = Probe(g.xs, g.ys, 5, 100e3, precision=DOUBLE)
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        from pyslice_tpu.physics.propagate import bandwidth_kmax2
        kmax2 = bandwidth_kmax2(kxs, kys, 0.5)
        layers = (1, g.nz - 1)
        out = to_numpy(multislice(probe.array[None], pot.array_szy, kxs,
                                  kys, eV=100e3, dz=g.dz,
                                  record_layers=layers, precision=DOUBLE,
                                  bandwidth_limit=0.5))
        want_pot = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[0],
                                           traj.atom_types)
        base = oracle.oracle_probe(g.xs, g.ys, 5, 100e3)
        for i, layer in enumerate(layers):
            want = oracle.oracle_propagate(base, want_pot[:, :, :layer + 1],
                                           g.xs, g.ys, g.zs, 100e3,
                                           kmax2=kmax2)
            assert oracle.residual(out[i, 0], want) < 1e-18

    def test_validation(self, setup):
        traj, g = setup
        from pyslice_tpu.physics.propagate import bandwidth_kmax2
        with pytest.raises(ValueError, match="bandwidth_limit"):
            bandwidth_kmax2([0.0], [0.0], 1.5)
        with pytest.raises(ValueError, match="not both"):
            multislice(np.zeros((1, 4, 4), np.complex128),
                       np.zeros((2, 4, 4)), np.zeros(4), np.zeros(4),
                       eV=100e3, dz=0.5, bandwidth_limit=0.5, kmax2=1.0)

    def test_calculator_surface(self, setup):
        """setup(bandwidth_limit=...) reaches the spec and changes the
        physics; the frame-cache key separates the two runs."""
        traj, g = setup
        from pyslice_tpu.engine.calculator import MultisliceCalculator
        calc1 = MultisliceCalculator(precision=DOUBLE)
        calc1.setup(traj, aperture=10, voltage_eV=100e3, sampling=0.4,
                    slice_thickness=2.0, probe_positions=[(2.0, 2.0)],
                    use_cache=False)
        calc2 = MultisliceCalculator(precision=DOUBLE)
        calc2.setup(traj, aperture=10, voltage_eV=100e3, sampling=0.4,
                    slice_thickness=2.0, probe_positions=[(2.0, 2.0)],
                    use_cache=False, bandwidth_limit=2.0 / 3.0)
        assert calc1.spec.kmax2 is None and calc2.spec.kmax2 is not None
        assert calc1._generate_cache_key() != calc2._generate_cache_key()
        wf1 = calc1.run(progress=False)
        wf2 = calc2.run(progress=False)
        d1 = np.asarray(wf1.wavefunction_data)
        d2 = np.asarray(wf2.wavefunction_data)
        assert not np.allclose(d1, d2)


class TestBeamTilt:
    """Tilted-propagator multislice (beyond-reference; Kirkland ch. 6
    small-tilt form): each Fresnel step gains exp(2 pi i dz (kx tan tx +
    ky tan ty)), advecting the wave by dz*tan(theta) per step."""

    def test_vs_tilted_oracle(self, setup):
        traj, g = setup
        from pyslice_tpu.physics.propagate import tilt_tangents
        tilt = (12.0, -5.0)
        tt = tilt_tangents(tilt)
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        probe = Probe(g.xs, g.ys, 15, 100e3, precision=DOUBLE)
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        got = to_numpy(multislice(probe.array[None], pot.array_szy, kxs,
                                  kys, eV=100e3, dz=g.dz, precision=DOUBLE,
                                  tilt=tilt))[0]
        want_pot = oracle.oracle_potential(g.xs, g.ys, g.zs,
                                           traj.positions[0],
                                           traj.atom_types)
        want = oracle.oracle_propagate(
            oracle.oracle_probe(g.xs, g.ys, 15, 100e3), want_pot,
            g.xs, g.ys, g.zs, 100e3, tantilt=tt)
        assert oracle.residual(got, want) < 1e-18
        full = oracle.oracle_propagate(
            oracle.oracle_probe(g.xs, g.ys, 15, 100e3), want_pot,
            g.xs, g.ys, g.zs, 100e3)
        assert oracle.residual(got, full) > 1e-12

    def test_vacuum_advection_is_exact_roll(self, setup):
        """Through VACUUM the tilted run equals the untilted run
        circularly shifted by (nz-1) * dz * tan(theta) — the tilt phase
        is exactly a per-step shift operator, and shifts commute with
        the Fresnel kernel."""
        _, g = setup
        nz = 5
        vac = np.zeros((nz, g.nx, g.ny))
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        probe = Probe(g.xs, g.ys, 20, 100e3, precision=DOUBLE)
        # one pixel of shift per step: tan(theta_x) = dx / dz
        tt = (g.dx / g.dz, 0.0)
        base = to_numpy(multislice(probe.array[None], vac, kxs, kys,
                                   eV=100e3, dz=g.dz, precision=DOUBLE))[0]
        tilted = to_numpy(multislice(probe.array[None], vac, kxs, kys,
                                     eV=100e3, dz=g.dz, precision=DOUBLE,
                                     tantilt=tt))[0]
        # exp(+2 pi i kx s) under ifft's e^{+2 pi i k x} evaluates psi at
        # x + s: content moves toward -x by one pixel per step.
        want = np.roll(base, -(nz - 1), axis=0)
        assert oracle.residual(tilted, want) < 1e-20

    def test_plane_wave_tilt_invariant(self, setup):
        """A plane wave (k=0 only) picks up zero tilt phase."""
        _, g = setup
        vac = np.zeros((3, g.nx, g.ny))
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        pw = np.ones((1, g.nx, g.ny), np.complex128)
        out = to_numpy(multislice(pw, vac, kxs, kys, eV=100e3, dz=g.dz,
                                  precision=DOUBLE, tilt=(20.0, 7.0)))[0]
        assert oracle.residual(out, pw[0]) < 1e-28

    def test_validation(self, setup):
        traj, g = setup
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        ksq = kxs[:, None] ** 2 + kys[None, :] ** 2
        with pytest.raises(ValueError, match="orthogonal"):
            multislice(np.zeros((1, g.nx, g.ny), np.complex128),
                       np.zeros((2, g.nx, g.ny)), kxs, kys, eV=100e3,
                       dz=0.5, tilt=(5.0, 0.0), ksq=ksq)
        with pytest.raises(ValueError, match="not both"):
            multislice(np.zeros((1, g.nx, g.ny), np.complex128),
                       np.zeros((2, g.nx, g.ny)), kxs, kys, eV=100e3,
                       dz=0.5, tilt=(5.0, 0.0), tantilt=(0.005, 0.0))

    def test_calculator_surface(self, setup):
        traj, g = setup
        from pyslice_tpu.engine.calculator import MultisliceCalculator
        calc = MultisliceCalculator(precision=DOUBLE)
        calc.setup(traj, aperture=10, voltage_eV=100e3, sampling=0.4,
                   slice_thickness=2.0, probe_positions=[(2.0, 2.0)],
                   use_cache=False, tilt=(8.0, 0.0))
        assert calc.spec.tantilt is not None
        calc0 = MultisliceCalculator(precision=DOUBLE)
        calc0.setup(traj, aperture=10, voltage_eV=100e3, sampling=0.4,
                    slice_thickness=2.0, probe_positions=[(2.0, 2.0)],
                    use_cache=False)
        assert calc._generate_cache_key() != calc0._generate_cache_key()
        d1 = np.asarray(calc.run(progress=False).wavefunction_data)
        d0 = np.asarray(calc0.run(progress=False).wavefunction_data)
        assert not np.allclose(d1, d0)


class TestDifferentiability:
    """JAX transformations compose through the compute path — a capability
    the torch-loop reference cannot offer (useful for probe/defocus
    optimization and ptychography-style inversion)."""

    def test_grad_through_multislice(self, setup):
        import jax
        import jax.numpy as jnp
        traj, g = setup
        pot = Potential(g.xs, g.ys, g.zs, traj.positions[0],
                        traj.atom_types, precision=DOUBLE)
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        psi0 = to_numpy(probe_array(g.xs, g.ys, 10, 100e3, DOUBLE))

        def loss(re, im):
            psi = jax.lax.complex(re, im)[None]
            out = multislice(psi, pot.array_szy, kxs, kys, eV=100e3,
                             dz=g.dz, precision=DOUBLE)
            return jnp.sum(jnp.abs(out) ** 2 * jnp.linspace(
                0, 1, out.shape[-1]))

        gre, gim = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(psi0.real), jnp.asarray(psi0.imag))
        assert np.all(np.isfinite(np.asarray(gre)))
        assert float(np.abs(np.asarray(gre)).sum()) > 0

    def test_grad_through_rasterizer_positions(self, setup):
        """d(potential)/d(atom positions) — sub-pixel placement is smooth."""
        import jax
        import jax.numpy as jnp
        traj, g = setup
        plan = make_plan(g.xs, g.ys, g.zs, traj.positions,
                         traj.atom_types)

        def loss(pos):
            v = rasterize(pos, plan, DOUBLE)
            return jnp.sum(v ** 2)

        grad = jax.grad(loss)(jnp.asarray(traj.positions[0]))
        arr = np.asarray(grad)
        assert arr.shape == traj.positions[0].shape
        assert np.all(np.isfinite(arr))
        # in-plane components must carry signal (k-space phase ramps)
        assert np.abs(arr[:, :2]).sum() > 0


class TestDebyeWaller:
    """Static thermal smearing: per-element exp(-B |g|^2/4) damping of
    the form factors (beyond-reference; the frozen-phonon alternative)."""

    def test_exact_damping(self, setup):
        traj, g = setup
        from pyslice_tpu.physics.potential import make_plan, rasterize
        B = 0.8
        pos = traj.positions[0]
        plain = make_plan(g.xs, g.ys, g.zs, pos, traj.atom_types)
        dwf = make_plan(g.xs, g.ys, g.zs, pos, traj.atom_types,
                        debye_waller={5: B, "N": B})
        v0 = np.asarray(rasterize(pos, plain, DOUBLE))
        v1 = np.asarray(rasterize(pos, dwf, DOUBLE))
        kxs = np.fft.fftfreq(g.nx, g.dx)
        kys = np.fft.fftfreq(g.ny, g.dy)
        damp = np.exp(-0.25 * B * (kxs[:, None] ** 2 + kys[None, :] ** 2))
        want = np.real(np.fft.ifft2(np.fft.fft2(v0, axes=(1, 2)) * damp,
                                    axes=(1, 2)))
        assert oracle.residual(v1, want) < 1e-24
        # damping actually reduces peak sharpness
        assert v1.max() < v0.max()

    def test_name_and_z_keys_equivalent(self, setup):
        traj, g = setup
        from pyslice_tpu.physics.potential import make_plan
        a = make_plan(g.xs, g.ys, g.zs, traj.positions[0], traj.atom_types,
                      debye_waller={"B": 0.5, "N": 1.0})
        b = make_plan(g.xs, g.ys, g.zs, traj.positions[0], traj.atom_types,
                      debye_waller={5: 0.5, 7: 1.0})
        np.testing.assert_array_equal(a.dwf_b, b.dwf_b)

    def test_validation(self, setup):
        traj, g = setup
        from pyslice_tpu.physics.potential import make_plan
        with pytest.raises(ValueError, match=">= 0"):
            make_plan(g.xs, g.ys, g.zs, traj.positions[0],
                      traj.atom_types, debye_waller={5: -1.0})
        with pytest.raises(ValueError, match="not in the structure"):
            make_plan(g.xs, g.ys, g.zs, traj.positions[0],
                      traj.atom_types, debye_waller={"Au": 0.5})

    def test_calculator_surface(self, setup):
        traj, g = setup
        from pyslice_tpu.engine.calculator import MultisliceCalculator
        calc = MultisliceCalculator(precision=DOUBLE)
        calc.setup(traj, aperture=10, voltage_eV=100e3, sampling=0.4,
                   slice_thickness=2.0, probe_positions=[(2.0, 2.0)],
                   use_cache=False, debye_waller={"B": 0.6, "N": 0.6})
        calc0 = MultisliceCalculator(precision=DOUBLE)
        calc0.setup(traj, aperture=10, voltage_eV=100e3, sampling=0.4,
                    slice_thickness=2.0, probe_positions=[(2.0, 2.0)],
                    use_cache=False)
        assert calc._generate_cache_key() != calc0._generate_cache_key()
        d1 = np.asarray(calc.run(progress=False).wavefunction_data)
        d0 = np.asarray(calc0.run(progress=False).wavefunction_data)
        assert not np.allclose(d1, d0)


class TestPlanCacheStability:
    """Round-4 compile-key stability: the bucket lists are traced inputs at
    the pipeline jit boundaries and the plan's shape-determining sizes are
    quantized, so trajectories of the same system compile to the SAME
    program (persistent-compile-cache hit across runs/files)."""

    @staticmethod
    def _case(slices, n=16, nz=8, seed=0):
        rng = np.random.default_rng(seed)
        xs = ys = np.linspace(0.0, 8.0, 32, endpoint=False)
        zs = np.linspace(0.0, 8.0, nz, endpoint=False)
        pos = np.zeros((n, 3))
        pos[:, 0] = rng.uniform(0, 8, n)
        pos[:, 1] = rng.uniform(0, 8, n)
        half = n // 2
        pos[:half, 2] = zs[slices[0]] + 0.3
        pos[half:, 2] = zs[slices[1]] + 0.3
        types = np.full(n, 14, np.int32)
        plan = make_plan(xs, ys, zs, pos[None], types)
        return pos, plan

    def test_quantized_shapes_match_across_occupancy(self):
        _, plan_a = self._case((1, 2))
        _, plan_b = self._case((3, 6), seed=1)
        assert plan_a.a_max == plan_b.a_max
        assert plan_a.n_buckets == plan_b.n_buckets
        # padding really happened (2 real buckets -> multiple of 4)
        assert np.sum(plan_a.bucket_types < 0) == 2

    def test_lowered_program_is_occupancy_independent(self):
        import jax
        from pyslice_tpu.physics.potential import rasterize_traced_buckets

        texts = []
        for case, seed in (((1, 2), 0), ((3, 6), 1)):
            pos, plan = self._case(case, seed=seed)
            low = jax.jit(
                rasterize_traced_buckets,
                static_argnames=("plan", "precision")).lower(
                    pos.astype(np.float32),
                    np.asarray(plan.bucket_types),
                    np.asarray(plan.bucket_slices), plan, SINGLE)
            texts.append(low.as_text())
        assert texts[0] == texts[1]

    def test_pipeline_program_is_trajectory_independent(self):
        import jax
        from pyslice_tpu.engine.pipeline import SimSpec, _frame_exit_waves
        texts = []
        for seed in (3, 4):
            traj = hbn_thermal(n_frames=3, sigma=0.05, nx=2, ny=2, seed=seed)
            g = grid_from_trajectory(traj, 0.25, 0.8)
            plan = make_plan(g.xs, g.ys, g.zs, traj.positions,
                             traj.atom_types)
            spec = SimSpec.create(g, plan, 100e3, precision=SINGLE)
            probes = np.ones((1, g.nx, g.ny), np.complex64)
            low = jax.jit(
                _frame_exit_waves, static_argnames=("spec",)).lower(
                    traj.positions[0].astype(np.float32), probes,
                    np.asarray(plan.bucket_types),
                    np.asarray(plan.bucket_slices), spec)
            texts.append(low.as_text())
        assert texts[0] == texts[1]

    def test_sentinel_padding_contributes_nothing(self):
        import dataclasses
        pos, plan = self._case((2, 5))
        real = plan.bucket_types >= 0
        assert real.sum() == 2 and len(real) == 4
        bare = dataclasses.replace(
            plan, bucket_types=plan.bucket_types[real],
            bucket_slices=plan.bucket_slices[real])
        out_pad = np.asarray(rasterize(pos, plan, DOUBLE))
        out_bare = np.asarray(rasterize(pos, bare, DOUBLE))
        np.testing.assert_array_equal(out_pad, out_bare)
        assert np.all(np.isfinite(out_pad))

    def test_a_max_ladder_monotone_and_bounded(self):
        from pyslice_tpu.physics.potential import _round_up
        prev = 0
        for max_count in range(1, 400):
            a = _round_up(max_count, 8)
            step = 8
            while step < a:
                step = _round_up(int(step * 1.25) + 1, 8)
            assert step >= max_count
            assert step <= max(8, int(np.ceil(max_count * 1.3)) + 8)
            assert step >= prev or max_count < prev  # ladder monotone

"""IO: LAMMPS dump / XYZ / CIF parsers and the caching loader facade."""

import numpy as np
import pytest

from pyslice_tpu.io import cif as cif_io
from pyslice_tpu.io import lammps as lammps_io
from pyslice_tpu.io import xyz as xyz_io
from pyslice_tpu.io.loader import TrajectoryLoader
from tests.fixtures import hbn_thermal


@pytest.fixture()
def traj():
    return hbn_thermal(n_frames=4, sigma=0.05)


class TestLammps:
    def test_roundtrip(self, traj, tmp_path):
        path = tmp_path / "t.lammpstrj"
        lammps_io.write_lammps_dump(path, traj.atom_types, traj.positions,
                                    traj.velocities, traj.box_matrix)
        types, pos, vel, box = lammps_io.parse_lammps_dump(path)
        np.testing.assert_array_equal(types, traj.atom_types)
        np.testing.assert_allclose(pos, traj.positions, atol=1e-5)
        np.testing.assert_allclose(vel, traj.velocities, atol=1e-5)
        np.testing.assert_allclose(box, traj.box_matrix, atol=1e-9)

    def test_scaled_coords(self, tmp_path):
        path = tmp_path / "s.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 4.0\n0 5.0\n0 8.0\n"
            "ITEM: ATOMS id type xs ys zs\n"
            "1 1 0.25 0.5 0.125\n2 2 0.5 0.2 0.25\n")
        types, pos, vel, box = lammps_io.parse_lammps_dump(path)
        np.testing.assert_allclose(pos[0, 0], [1.0, 2.5, 1.0])
        np.testing.assert_allclose(pos[0, 1], [2.0, 1.0, 2.0])

    def test_unwrap_continuity(self):
        """An atom crossing the boundary keeps moving monotonically."""
        L = np.array([10.0, 10.0, 10.0])
        wrapped = np.zeros((4, 1, 3))
        wrapped[:, 0, 0] = [9.5, 9.9, 0.3, 0.7]   # crosses x boundary
        out = lammps_io.unwrap_continuity(wrapped, L)
        np.testing.assert_allclose(out[:, 0, 0], [9.5, 9.9, 10.3, 10.7])

    def test_image_flags(self, tmp_path):
        path = tmp_path / "i.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 10.0\n0 10.0\n0 10.0\n"
            "ITEM: ATOMS id type x y z ix iy iz\n"
            "1 1 1.0 2.0 3.0 1 0 -1\n")
        _, pos, _, _ = lammps_io.parse_lammps_dump(path)
        np.testing.assert_allclose(pos[0, 0], [11.0, 2.0, -7.0])

    def test_triclinic_box(self, tmp_path):
        path = tmp_path / "tri.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
            "ITEM: BOX BOUNDS xy xz yz pp pp pp\n"
            "0.0 11.0 1.0\n0.0 5.0 0.0\n0.0 8.0 0.0\n"
            "ITEM: ATOMS id type x y z\n1 1 1.0 1.0 1.0\n")
        _, _, _, box = lammps_io.parse_lammps_dump(path)
        # bounding box [0,11] with xy=1 -> lx = 11 - max(0,1) - ... = 10
        assert box[0, 0] == pytest.approx(10.0)
        assert box[0, 1] == pytest.approx(1.0)   # xy tilt

    def test_triclinic_image_flag_unwrap(self, tmp_path):
        """Image flags in a tilted cell must add i @ cell-vectors, including
        the tilt components (iy=1 contributes (xy, ly, 0), not (0, ly, 0))."""
        path = tmp_path / "tri_im.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
            "ITEM: BOX BOUNDS xy xz yz pp pp pp\n"
            "0.0 11.0 1.0\n0.0 5.0 0.0\n0.0 8.0 0.0\n"
            "ITEM: ATOMS id type x y z ix iy iz\n"
            "1 1 1.0 1.0 1.0 0 1 0\n")
        _, pos, _, box = lammps_io.parse_lammps_dump(path)
        # cell vectors are box columns: a2 = (xy, ly, 0) = (1, 5, 0)
        np.testing.assert_allclose(pos[0, 0], [1.0 + 1.0, 1.0 + 5.0, 1.0])

    def test_unwrap_continuity_triclinic(self):
        """Continuity unwrap uses the full cell (min image in fractional
        coords), so a jump by one tilted cell vector is removed exactly."""
        box = np.array([[10.0, 3.0, 0.0], [0.0, 8.0, 0.0], [0.0, 0.0, 6.0]])
        p0 = np.array([[9.0, 7.5, 1.0]])
        p1_true = p0 + np.array([0.2, 0.3, 0.0])
        p1_wrapped = p1_true - box[:, 1]        # rewrapped along a2=(3,8,0)
        out = lammps_io.unwrap_continuity(np.stack([p0, p1_wrapped]), box)
        np.testing.assert_allclose(out[1], p1_true, atol=1e-12)

    # --- malformed-file fuzzing (errors must be ValueError w/ line info) ----

    def _base_dump(self):
        return ("ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n2\n"
                "ITEM: BOX BOUNDS pp pp pp\n0 10.0\n0 10.0\n0 10.0\n"
                "ITEM: ATOMS id type x y z\n"
                "1 1 1.0 2.0 3.0\n2 2 4.0 5.0 6.0\n")

    def test_truncated_frame(self, tmp_path):
        path = tmp_path / "t.lammpstrj"
        good = self._base_dump()
        path.write_text(good[:good.rfind("2 2")])    # drop the last atom row
        with pytest.raises(ValueError, match="truncated frame"):
            lammps_io.parse_lammps_dump(path)

    def test_missing_columns(self, tmp_path):
        path = tmp_path / "m.lammpstrj"
        path.write_text(self._base_dump().replace(
            "ITEM: ATOMS id type x y z", "ITEM: ATOMS id type q1 q2 q3"))
        with pytest.raises(ValueError, match="coordinate columns"):
            lammps_io.parse_lammps_dump(path)

    def test_ragged_atom_rows(self, tmp_path):
        path = tmp_path / "r.lammpstrj"
        path.write_text(self._base_dump().replace(
            "2 2 4.0 5.0 6.0", "2 2 4.0 5.0"))
        with pytest.raises(ValueError, match="line"):
            lammps_io.parse_lammps_dump(path)

    def test_row_width_vs_header_mismatch(self, tmp_path):
        path = tmp_path / "w.lammpstrj"
        path.write_text(self._base_dump().replace(
            "1 1 1.0 2.0 3.0\n2 2 4.0 5.0 6.0",
            "1 1 1.0 2.0 3.0 9.0\n2 2 4.0 5.0 6.0 9.0"))
        with pytest.raises(ValueError, match="declares 5"):
            lammps_io.parse_lammps_dump(path)

    def test_bad_atom_count(self, tmp_path):
        path = tmp_path / "c.lammpstrj"
        path.write_text(self._base_dump().replace(
            "ITEM: NUMBER OF ATOMS\n2", "ITEM: NUMBER OF ATOMS\nxx"))
        with pytest.raises(ValueError, match="integer atom count"):
            lammps_io.parse_lammps_dump(path)

    def test_missing_box_header(self, tmp_path):
        path = tmp_path / "b.lammpstrj"
        path.write_text(self._base_dump().replace(
            "ITEM: BOX BOUNDS pp pp pp\n", ""))
        with pytest.raises(ValueError, match="BOX BOUNDS"):
            lammps_io.parse_lammps_dump(path)

    def test_no_assertion_errors_reachable(self, tmp_path):
        """Arbitrary garbage never raises bare AssertionError."""
        rng = np.random.default_rng(0)
        base = self._base_dump()
        for k in range(20):
            # random truncations and byte deletions
            cut = rng.integers(1, len(base))
            for text in (base[:cut], base[:cut] + base[cut + 7:]):
                path = tmp_path / f"fuzz{k}.lammpstrj"
                path.write_text(text)
                try:
                    lammps_io.parse_lammps_dump(path)
                except (ValueError, KeyError, IndexError):
                    pass
                except AssertionError:
                    raise AssertionError(
                        f"bare assert reachable with cut={cut}")


class TestXYZ:
    def test_roundtrip(self, traj, tmp_path):
        path = tmp_path / "t.xyz"
        xyz_io.write_xyz(path, traj.atom_types, traj.positions,
                         traj.box_matrix, traj.velocities)
        types, pos, vel, box = xyz_io.parse_xyz(path)
        np.testing.assert_array_equal(types, traj.atom_types)
        np.testing.assert_allclose(pos, traj.positions, atol=1e-5)
        np.testing.assert_allclose(box, traj.box_matrix, atol=1e-9)


class TestCIF:
    CIF_P1 = """
data_test
_cell_length_a 4.0
_cell_length_b 5.0
_cell_length_c 6.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
B1 B 0.0 0.0 0.25
N1 N 0.5 0.5 0.75
"""

    CIF_SYMOPS = """
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_symmetry_equiv_pos_as_xyz
'x, y, z'
'-x+1/2, y, z'
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
C1 C 0.1 0.2 0.3
"""

    def test_p1(self, tmp_path):
        p = tmp_path / "a.cif"
        p.write_text(self.CIF_P1)
        types, pos, box = cif_io.parse_cif(p)
        np.testing.assert_array_equal(types, [5, 7])
        np.testing.assert_allclose(np.diag(box), [4.0, 5.0, 6.0])
        np.testing.assert_allclose(pos[0, 1], [2.0, 2.5, 4.5])

    def test_symop_expansion(self, tmp_path):
        p = tmp_path / "b.cif"
        p.write_text(self.CIF_SYMOPS)
        types, pos, box = cif_io.parse_cif(p)
        assert len(types) == 2
        got = sorted(pos[0, :, 0].tolist())
        np.testing.assert_allclose(got, [0.4, 1.6])   # x=0.1, -0.1+0.5=0.4

    def test_hexagonal_cell(self):
        box = cif_io.cell_to_box(2.504, 2.504, 6.784, 90, 90, 120)
        assert box[0, 0] == pytest.approx(2.504)
        assert box[0, 1] == pytest.approx(2.504 * np.cos(np.radians(120)))
        assert box[1, 1] == pytest.approx(2.504 * np.sin(np.radians(120)))
        assert box[2, 2] == pytest.approx(6.784)

    def test_reference_hbn_cif(self, tmp_path):
        """Parse the real-world hBN CIF layout (SpringerMaterials style)."""
        import shutil
        src = "/root/reference/src/unittests/hBN.cif"
        import os
        if not os.path.exists(src):
            pytest.skip("reference fixture not available")
        p = tmp_path / "hBN.cif"
        shutil.copy(src, p)
        types, pos, box = cif_io.parse_cif(p)
        assert sorted(types.tolist()) == [5, 7]     # one B + one N site (P1)
        assert box[2, 2] == pytest.approx(6.784)

    CIF_OCC = """
data_test
_cell_length_a 4.0
_cell_length_b 4.0
_cell_length_c 4.0
_cell_angle_alpha 90
_cell_angle_beta 90
_cell_angle_gamma 90
loop_
_atom_site_label
_atom_site_type_symbol
_atom_site_fract_x
_atom_site_fract_y
_atom_site_fract_z
_atom_site_occupancy
B1 B 0.0 0.0 0.0 1.0
N1 N 0.5 0.5 0.5 0.7
C1 C 0.25 0.25 0.25 0.3
"""

    def test_occupancy_round(self, tmp_path):
        p = tmp_path / "o.cif"
        p.write_text(self.CIF_OCC)
        types, pos, _ = cif_io.parse_cif(p)          # default "round"
        assert sorted(types.tolist()) == [5, 7]      # C (0.3) dropped
        assert pos.shape == (1, 2, 3)

    def test_occupancy_all(self, tmp_path):
        p = tmp_path / "o.cif"
        p.write_text(self.CIF_OCC)
        types, _, _ = cif_io.parse_cif(p, occupancy="all")
        assert sorted(types.tolist()) == [5, 6, 7]

    def test_occupancy_sample_statistics(self, tmp_path):
        p = tmp_path / "o.cif"
        p.write_text(self.CIF_OCC)
        kept_n = kept_c = 0
        n_draws = 200
        for seed in range(n_draws):
            types, _, _ = cif_io.parse_cif(p, occupancy="sample",
                                           occupancy_seed=seed)
            assert 5 in types.tolist()               # occ 1.0 always kept
            kept_n += 7 in types.tolist()
            kept_c += 6 in types.tolist()
        assert abs(kept_n / n_draws - 0.7) < 0.1     # ~Binomial(200, .7)
        assert abs(kept_c / n_draws - 0.3) < 0.1

    def test_occupancy_sample_deterministic(self, tmp_path):
        p = tmp_path / "o.cif"
        p.write_text(self.CIF_OCC)
        a = cif_io.parse_cif(p, occupancy="sample", occupancy_seed=3)
        b = cif_io.parse_cif(p, occupancy="sample", occupancy_seed=3)
        np.testing.assert_array_equal(a[0], b[0])

    def test_occupancy_bad_policy(self, tmp_path):
        p = tmp_path / "o.cif"
        p.write_text(self.CIF_OCC)
        with pytest.raises(ValueError, match="occupancy"):
            cif_io.parse_cif(p, occupancy="bogus")


class TestVASP:
    POSCAR5 = """hBN-ish test cell
1.0
4.0 0.0 0.0
0.0 5.0 0.0
0.0 0.0 6.0
B N
1 2
Direct
0.0 0.0 0.25
0.5 0.5 0.75
0.25 0.25 0.5
"""

    def test_poscar_vasp5_direct(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        p = tmp_path / "POSCAR"
        p.write_text(self.POSCAR5)
        types, pos, vel, box = vasp_io.parse_poscar(p)
        np.testing.assert_array_equal(types, [5, 7, 7])
        np.testing.assert_allclose(np.diag(box), [4.0, 5.0, 6.0])
        np.testing.assert_allclose(pos[0, 1], [2.0, 2.5, 4.5])
        assert vel.shape == pos.shape and not vel.any()

    def test_poscar_negative_scale_sets_volume(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        txt = self.POSCAR5.replace("1.0\n4.0", "-960.0\n4.0")  # 2^3 x 120
        p = tmp_path / "POSCAR"
        p.write_text(txt)
        _, _, _, box = vasp_io.parse_poscar(p)
        assert abs(np.linalg.det(box)) == pytest.approx(960.0)

    def test_poscar_vasp4_numeric_types(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        txt = self.POSCAR5.replace("B N\n", "")
        p = tmp_path / "POSCAR"
        p.write_text(txt)
        types, pos, _, _ = vasp_io.parse_poscar(p)
        np.testing.assert_array_equal(types, [1, 2, 2])

    def test_poscar_cartesian_selective(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        p = tmp_path / "test.vasp"
        p.write_text("""t
2.0
2.0 0.0 0.0
0.0 2.5 0.0
0.0 0.0 3.0
B N
1 1
Selective dynamics
Cartesian
0.1 0.2 0.3 T T T
0.4 0.5 0.6 F F F
""")
        types, pos, _, box = vasp_io.parse_poscar(p)
        np.testing.assert_array_equal(types, [5, 7])
        np.testing.assert_allclose(pos[0, 0], [0.2, 0.4, 0.6])  # x scale
        np.testing.assert_allclose(np.diag(box), [4.0, 5.0, 6.0])

    def test_poscar_velocities(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        p = tmp_path / "POSCAR"
        p.write_text(self.POSCAR5 + "\n0.1 0.0 0.0\n0.0 0.2 0.0\n0.0 0.0 0.3\n")
        _, pos, vel, _ = vasp_io.parse_poscar(p)
        np.testing.assert_allclose(vel[0, 1], [0.0, 0.2, 0.0])

    def test_xdatcar_multiframe(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        p = tmp_path / "XDATCAR"
        p.write_text("""t
1.0
4.0 0.0 0.0
0.0 4.0 0.0
0.0 0.0 4.0
B
1
Direct configuration=     1
0.0 0.0 0.0
Direct configuration=     2
0.25 0.0 0.0
Direct configuration=     3
0.5 0.0 0.0
""")
        types, pos, _, _ = vasp_io.parse_poscar(p)
        assert pos.shape == (3, 1, 3)
        np.testing.assert_allclose(pos[:, 0, 0], [0.0, 1.0, 2.0])

    def test_loader_dispatch_and_trajectory(self, tmp_path):
        from pyslice_tpu.io.loader import TrajectoryLoader
        p = tmp_path / "CONTCAR"
        p.write_text(self.POSCAR5)
        t = TrajectoryLoader(p, timestep=0.01, use_cache=False).load()
        assert t.n_atoms == 3 and t.n_frames == 1
        np.testing.assert_array_equal(t.atom_types, [5, 7, 7])

    def test_truncated_errors(self, tmp_path):
        from pyslice_tpu.io import vasp as vasp_io
        p = tmp_path / "POSCAR"
        p.write_text("\n".join(self.POSCAR5.splitlines()[:9]) + "\n")
        with pytest.raises(ValueError, match="truncated"):
            vasp_io.parse_poscar(p)


class TestAmberNetCDF:
    @staticmethod
    def _write_nc(path, pos, vel=None, lengths=None, angles=None,
                  conventions="AMBER", vel_scale=None):
        """AMBER-convention NetCDF-3 fixture via scipy's writer."""
        from scipy.io import netcdf_file
        n_f, n_a, _ = pos.shape
        with netcdf_file(str(path), "w") as f:
            f.Conventions = conventions
            f.ConventionVersion = "1.0"
            f.createDimension("frame", None)
            f.createDimension("atom", n_a)
            f.createDimension("spatial", 3)
            f.createDimension("cell_spatial", 3)
            f.createDimension("cell_angular", 3)
            v = f.createVariable("coordinates", "f", ("frame", "atom",
                                                      "spatial"))
            v[:] = pos.astype(np.float32)
            v.units = "angstrom"
            if vel is not None:
                w = f.createVariable("velocities", "f", ("frame", "atom",
                                                         "spatial"))
                data = vel if vel_scale is None else vel / vel_scale
                w[:] = data.astype(np.float32)
                if vel_scale is not None:
                    w.scale_factor = np.float32(vel_scale)
            if lengths is not None:
                c = f.createVariable("cell_lengths", "d", ("frame",
                                                           "cell_spatial"))
                c[:] = np.asarray(lengths, np.float64)
                a = f.createVariable("cell_angles", "d", ("frame",
                                                          "cell_angular"))
                a[:] = (np.asarray(angles, np.float64) if angles is not None
                        else np.full((n_f, 3), 90.0))

    def test_roundtrip_with_cell_and_velocities(self, tmp_path):
        from pyslice_tpu.io import amber as amber_io
        rng = np.random.default_rng(0)
        pos = rng.random((5, 7, 3)) * 10.0
        vel = rng.standard_normal((5, 7, 3))
        p = tmp_path / "t.nc"
        self._write_nc(p, pos, vel, lengths=np.tile([10.0, 12.0, 14.0],
                                                    (5, 1)),
                       vel_scale=20.455)
        types, got_pos, got_vel, box = amber_io.parse_amber_netcdf(p)
        np.testing.assert_array_equal(types, np.ones(7, np.int32))
        np.testing.assert_allclose(got_pos, pos, atol=1e-5)
        np.testing.assert_allclose(got_vel, vel, atol=1e-3)
        np.testing.assert_allclose(np.diag(box), [10.0, 12.0, 14.0])

    def test_loader_dispatch_and_mapping(self, tmp_path):
        from pyslice_tpu.io.loader import TrajectoryLoader
        rng = np.random.default_rng(1)
        pos = rng.random((3, 4, 3)) * 8.0
        p = tmp_path / "run.nc"
        self._write_nc(p, pos, lengths=np.tile([8.0, 8.0, 8.0], (3, 1)))
        t = TrajectoryLoader(p, timestep=0.002, atom_mapping={1: "Si"},
                             use_cache=False).load()
        assert t.n_frames == 3 and t.n_atoms == 4
        np.testing.assert_array_equal(t.atom_types, [14, 14, 14, 14])

    def test_npt_cell_rejected(self, tmp_path):
        from pyslice_tpu.io import amber as amber_io
        pos = np.zeros((2, 3, 3))
        lengths = np.array([[10.0, 10.0, 10.0], [10.5, 10.0, 10.0]])
        p = tmp_path / "npt.nc"
        self._write_nc(p, pos, lengths=lengths)
        with pytest.raises(ValueError, match="NPT"):
            amber_io.parse_amber_netcdf(p)

    def test_no_cell_falls_back_to_extent(self, tmp_path):
        from pyslice_tpu.io import amber as amber_io
        pos = np.array([[[0.0, 0.0, 0.0], [4.0, 2.0, 3.0]]])
        p = tmp_path / "vac.nc"
        self._write_nc(p, pos)
        _, _, _, box = amber_io.parse_amber_netcdf(p)
        np.testing.assert_allclose(np.diag(box), [4.0, 2.0, 3.0])

    def test_not_amber_errors(self, tmp_path):
        from scipy.io import netcdf_file
        from pyslice_tpu.io import amber as amber_io
        p = tmp_path / "x.nc"
        with netcdf_file(str(p), "w") as f:
            f.createDimension("n", 2)
            v = f.createVariable("other", "d", ("n",))
            v[:] = [1.0, 2.0]
        with pytest.raises(ValueError, match="coordinates"):
            amber_io.parse_amber_netcdf(p)


class TestGSD:
    @staticmethod
    def _fixture(tmp_path, name="t.gsd", n_f=3, n_a=5, seed=0, **kw):
        from pyslice_tpu.io import gsd as gsd_io
        rng = np.random.default_rng(seed)
        box = np.array([[10.0, 0.0, 0.0], [0.0, 12.0, 0.0],
                        [0.0, 0.0, 14.0]])
        pos = rng.random((n_f, n_a, 3)) * np.diag(box)
        vel = rng.standard_normal((n_f, n_a, 3))
        p = tmp_path / name
        gsd_io.write_gsd(p, pos, box, velocities=vel, **kw)
        return p, pos, vel, box

    @pytest.mark.parametrize("layer", [(1, 0), (2, 0)])
    def test_roundtrip_both_file_layers(self, tmp_path, layer):
        from pyslice_tpu.io import gsd as gsd_io
        p, pos, vel, box = self._fixture(
            tmp_path, gsd_version=layer,
            type_names=["B", "N"], typeid=np.array([0, 1, 1, 0, 1]))
        types, got_pos, got_vel, got_box = gsd_io.parse_gsd(p)
        np.testing.assert_array_equal(types, [5, 7, 7, 5, 7])
        np.testing.assert_allclose(got_pos, pos, atol=1e-5)
        np.testing.assert_allclose(got_vel, vel, atol=1e-5)
        np.testing.assert_allclose(got_box, box)

    def test_image_flags_unwrap(self, tmp_path):
        from pyslice_tpu.io import gsd as gsd_io
        box = np.diag([8.0, 8.0, 8.0])
        # unwrapped target positions reach outside the box; store wrapped
        unwrapped = np.array([[[1.0, 2.0, 3.0], [9.5, -2.0, 19.0]]])
        image = np.floor(unwrapped / 8.0).astype(np.int32)
        wrapped = unwrapped - image * 8.0
        p = tmp_path / "img.gsd"
        gsd_io.write_gsd(p, wrapped, box, image=image)
        _, got, _, _ = gsd_io.parse_gsd(p)
        np.testing.assert_allclose(got, unwrapped, atol=1e-5)

    def test_triclinic_box(self, tmp_path):
        from pyslice_tpu.io import gsd as gsd_io
        box = np.array([[10.0, 1.5, 0.4], [0.0, 12.0, 0.8],
                        [0.0, 0.0, 14.0]])
        pos = np.array([[[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]])
        p = tmp_path / "tri.gsd"
        gsd_io.write_gsd(p, pos, box)
        _, got_pos, _, got_box = gsd_io.parse_gsd(p)
        np.testing.assert_allclose(got_box, box, atol=1e-6)
        np.testing.assert_allclose(got_pos, pos, atol=1e-5)

    def test_loader_dispatch_and_mapping(self, tmp_path):
        from pyslice_tpu.io.loader import TrajectoryLoader
        # non-element type names -> 1-based ids, remapped via atom_mapping
        p, *_ = self._fixture(tmp_path, name="run.gsd",
                              type_names=["A", "B2"],
                              typeid=np.array([0, 1, 0, 1, 0]))
        t = TrajectoryLoader(p, timestep=0.002,
                             atom_mapping={1: "Si", 2: "C"},
                             use_cache=False).load()
        assert t.n_frames == 3 and t.n_atoms == 5
        np.testing.assert_array_equal(t.atom_types, [14, 6, 14, 6, 14])

    def test_npt_box_rejected(self, tmp_path):
        from pyslice_tpu.io import gsd as gsd_io
        p, *_ = self._fixture(
            tmp_path, extra_chunks=[(1, "configuration/box",
                                     np.array([11.0, 12.0, 14.0, 0, 0, 0],
                                              np.float32))])
        with pytest.raises(ValueError, match="NPT"):
            gsd_io.parse_gsd(p)

    def test_frame0_fallback_for_static_chunks(self, tmp_path):
        # typeid/types/N written only at frame 0 must apply to all frames
        from pyslice_tpu.io import gsd as gsd_io
        p, pos, _, _ = self._fixture(tmp_path, type_names=["Si"],
                                     typeid=np.zeros(5, np.uint32))
        f = gsd_io.GSDFile(p)
        assert f.n_frames == 3
        assert not f.chunk_exists(2, "particles/typeid")
        types, got_pos, _, _ = gsd_io.parse_gsd(p)
        np.testing.assert_array_equal(types, [14] * 5)
        assert got_pos.shape == (3, 5, 3)

    def test_bad_magic_rejected(self, tmp_path):
        from pyslice_tpu.io import gsd as gsd_io
        p = tmp_path / "x.gsd"
        p.write_bytes(b"\x00" * 256)
        with pytest.raises(ValueError, match="magic"):
            gsd_io.parse_gsd(p)

    def test_truncated_chunk_rejected(self, tmp_path):
        from pyslice_tpu.io import gsd as gsd_io
        p, *_ = self._fixture(tmp_path)
        f = gsd_io.GSDFile(p)
        loc, n, m, dt = f.index[(2, "particles/position")]
        # cut the file inside the last frame's position chunk
        with open(p, "r+b") as fh:
            fh.truncate(loc + (n * m * dt.itemsize) // 2)
        with pytest.raises(ValueError, match="truncated|GSD"):
            gsd_io.parse_gsd(p)

    def test_hostile_header_counts_rejected(self, tmp_path):
        # A corrupt header declaring a huge index must fail loudly up
        # front, not attempt a multi-GB read (advisor round-4 finding).
        from pyslice_tpu.io import gsd as gsd_io
        p, *_ = self._fixture(tmp_path)
        with open(p, "r+b") as fh:      # idx_n lives at header bytes 16:24
            fh.seek(16)
            fh.write((1 << 40).to_bytes(8, "little"))
        with pytest.raises(ValueError, match="beyond"):
            gsd_io.GSDFile(p)

    def test_2d_trajectory_rejected(self, tmp_path):
        # dimensions=2 / lz=0 boxes are singular for multislice; the
        # reader must say so instead of failing later in grid setup.
        from pyslice_tpu.io import gsd as gsd_io
        box = np.diag([8.0, 8.0, 0.0])
        pos = np.zeros((1, 2, 3))
        p = tmp_path / "flat.gsd"
        gsd_io.write_gsd(
            p, pos, box,
            extra_chunks=[(0, "configuration/dimensions",
                           np.array([2], np.uint8))])
        with pytest.raises(ValueError, match="2-D"):
            gsd_io.parse_gsd(p)


class TestLoader:
    def test_load_with_mapping_and_cache(self, traj, tmp_path):
        path = tmp_path / "t.lammpstrj"
        # write with generic types 1/2, map back to B/N
        generic = np.where(traj.atom_types == 5, 1, 2)
        lammps_io.write_lammps_dump(path, generic, traj.positions,
                                    traj.velocities, traj.box_matrix)
        loader = TrajectoryLoader(str(path), timestep=0.005,
                                  atom_mapping={1: "B", 2: 7})
        t = loader.load()
        np.testing.assert_array_equal(t.atom_types, traj.atom_types)
        assert t.timestep == 0.005
        # cache files appear and are used on reload
        assert (tmp_path / "t.positions.npy").exists()
        t2 = TrajectoryLoader(str(path), timestep=0.005).load()
        np.testing.assert_allclose(t2.positions, t.positions)

    def test_cache_hit_applies_new_mapping(self, traj, tmp_path):
        """The cache stores RAW dump types; a reload with a different
        atom_mapping must reflect the new mapping, not the cached one
        (the reference silently returns the old mapping's types)."""
        path = tmp_path / "m.lammpstrj"
        generic = np.where(traj.atom_types == 5, 1, 2)
        lammps_io.write_lammps_dump(path, generic, traj.positions,
                                    traj.velocities, traj.box_matrix)
        t1 = TrajectoryLoader(str(path), atom_mapping={1: "B", 2: "N"}).load()
        assert sorted(np.unique(t1.atom_types)) == [5, 7]
        # cache now exists; different mapping must win over the cache
        t2 = TrajectoryLoader(str(path), atom_mapping={1: "C", 2: "O"}).load()
        assert sorted(np.unique(t2.atom_types)) == [6, 8]
        # and no mapping returns the raw types
        t3 = TrajectoryLoader(str(path)).load()
        assert sorted(np.unique(t3.atom_types)) == [1, 2]

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            TrajectoryLoader("/nonexistent/file.lammpstrj")

    def test_bad_timestep(self, tmp_path):
        p = tmp_path / "x.xyz"
        p.write_text("1\n\nC 0 0 0\n")
        with pytest.raises(ValueError):
            TrajectoryLoader(str(p), timestep=-1.0)

    def test_bad_mapping(self, tmp_path):
        p = tmp_path / "x.xyz"
        p.write_text("1\n\nC 0 0 0\n")
        with pytest.raises(ValueError):
            TrajectoryLoader(str(p), atom_mapping={1: 500})

    def test_xyz_and_random_displacements(self, traj, tmp_path):
        """The 06_loaders.py reference flow: load -> displace -> rasterize."""
        path = tmp_path / "t.xyz"
        xyz_io.write_xyz(path, traj.atom_types, traj.positions[0:1],
                         traj.box_matrix)
        t = TrajectoryLoader(str(path)).load()
        d = t.generate_random_displacements(n_displacements=5, sigma=0.5,
                                            seed=0)
        assert d.n_frames == 5


class TestIngestSurfaces:
    """Formats the reference inherits from OVITO (loader.py:195-271):
    gzipped dumps, element-name atom columns, multi-file patterns."""

    def test_gzip_dump(self, traj, tmp_path):
        import gzip
        path = tmp_path / "t.lammpstrj"
        lammps_io.write_lammps_dump(path, traj.atom_types, traj.positions,
                                    traj.velocities, traj.box_matrix)
        gz = tmp_path / "t2.lammpstrj.gz"
        gz.write_bytes(gzip.compress(path.read_bytes()))
        got = TrajectoryLoader(str(gz), timestep=0.01,
                               use_cache=False).load()
        np.testing.assert_allclose(got.positions, traj.positions, atol=1e-5)
        np.testing.assert_array_equal(got.atom_types, traj.atom_types)

    def test_gzip_cache_stem_strips_format_suffix(self, traj, tmp_path):
        import gzip
        path = tmp_path / "t.lammpstrj"
        lammps_io.write_lammps_dump(path, traj.atom_types, traj.positions,
                                    traj.velocities, traj.box_matrix)
        gz = tmp_path / "t3.lammpstrj.gz"
        gz.write_bytes(gzip.compress(path.read_bytes()))
        TrajectoryLoader(str(gz), timestep=0.01).load()
        assert (tmp_path / "t3.positions.npy").exists()

    def test_element_name_column(self, tmp_path):
        path = tmp_path / "e.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\n"
            "ITEM: NUMBER OF ATOMS\n3\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 10\n0 10\n0 10\n"
            "ITEM: ATOMS id element x y z\n"
            "1 B 1.0 2.0 3.0\n"
            "2 N 4.0 5.0 6.0\n"
            "3 Si 7.0 8.0 9.0\n")
        types, pos, vel, box = lammps_io.parse_lammps_dump(path)
        np.testing.assert_array_equal(types, [5, 7, 14])   # already Z
        np.testing.assert_allclose(pos[0, 1], [4.0, 5.0, 6.0])

    def test_element_column_with_numeric_type(self, tmp_path):
        """A numeric `type` column wins (mapping stays the user's job)."""
        path = tmp_path / "et.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\n"
            "ITEM: NUMBER OF ATOMS\n2\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 10\n0 10\n0 10\n"
            "ITEM: ATOMS id type element x y z\n"
            "1 1 B 1.0 2.0 3.0\n"
            "2 2 N 4.0 5.0 6.0\n")
        types, _, _, _ = lammps_io.parse_lammps_dump(path)
        np.testing.assert_array_equal(types, [1, 2])

    def test_unknown_element_symbol_errors_with_line(self, tmp_path):
        path = tmp_path / "bad.lammpstrj"
        path.write_text(
            "ITEM: TIMESTEP\n0\n"
            "ITEM: NUMBER OF ATOMS\n1\n"
            "ITEM: BOX BOUNDS pp pp pp\n0 10\n0 10\n0 10\n"
            "ITEM: ATOMS id element x y z\n"
            "1 Xx 1.0 2.0 3.0\n")
        with pytest.raises(ValueError, match="line 10.*Xx"):
            lammps_io.parse_lammps_dump(path)

    def test_multifile_glob_pattern(self, traj, tmp_path):
        # 4 frames split 2+1+1 across dump.1/dump.2/dump.10 — natural order
        # must read dump.2 before dump.10.
        splits = [(0, 2), (2, 3), (3, 4)]
        for name, (a, b) in zip(["dump.1.lammpstrj", "dump.2.lammpstrj",
                                 "dump.10.lammpstrj"], splits):
            lammps_io.write_lammps_dump(
                tmp_path / name, traj.atom_types, traj.positions[a:b],
                traj.velocities[a:b], traj.box_matrix)
        got = TrajectoryLoader(str(tmp_path / "dump.*.lammpstrj"),
                               timestep=0.01, use_cache=False).load()
        assert got.n_frames == 4
        np.testing.assert_allclose(got.positions, traj.positions, atol=1e-5)

    def test_multifile_explicit_list(self, traj, tmp_path):
        files = []
        for k in range(2):
            p = tmp_path / f"part{k}.lammpstrj"
            lammps_io.write_lammps_dump(
                p, traj.atom_types, traj.positions[2 * k:2 * k + 2],
                traj.velocities[2 * k:2 * k + 2], traj.box_matrix)
            files.append(p)
        got = TrajectoryLoader(files, timestep=0.01, use_cache=False).load()
        np.testing.assert_allclose(got.positions, traj.positions, atol=1e-5)

    def test_multifile_boundary_unwrap_seam(self, tmp_path):
        """An atom crossing a periodic boundary INSIDE an earlier file must
        not teleport by a box length at the file seam: each file's
        continuity unwrap re-bases on its own first frame, so the loader
        stitches a per-atom lattice shift at every seam."""
        L = 10.0
        box = np.diag([L, L, 6.0])
        x_true = np.array([7.0, 8.2, 9.4, 10.6, 11.8, 13.0])
        pos = np.zeros((6, 1, 3))
        pos[:, 0, 0] = x_true % L          # wrapped coordinates on disk
        pos[:, 0, 2] = 3.0
        vel = np.zeros_like(pos)
        types = np.array([1])
        lammps_io.write_lammps_dump(tmp_path / "w.lammpstrj", types, pos,
                                    vel, box)
        single = TrajectoryLoader(tmp_path / "w.lammpstrj", timestep=0.01,
                                  use_cache=False).load()
        np.testing.assert_allclose(single.positions[:, 0, 0], x_true,
                                   atol=1e-5)
        lammps_io.write_lammps_dump(tmp_path / "s1.lammpstrj", types,
                                    pos[:3], vel[:3], box)
        lammps_io.write_lammps_dump(tmp_path / "s2.lammpstrj", types,
                                    pos[3:], vel[3:], box)
        split = TrajectoryLoader([tmp_path / "s1.lammpstrj",
                                  tmp_path / "s2.lammpstrj"],
                                 timestep=0.01, use_cache=False).load()
        np.testing.assert_allclose(split.positions[:, 0, 0], x_true,
                                   atol=1e-5)

    def test_multifile_cache_distinct_sets(self, traj, tmp_path):
        """Same first file + same file count but a DIFFERENT second file
        must not serve the previous set's cache."""
        for k in range(3):
            lammps_io.write_lammps_dump(
                tmp_path / f"set{k}.lammpstrj", traj.atom_types,
                traj.positions[k:k + 2] + k,        # distinct contents
                traj.velocities[k:k + 2], traj.box_matrix)
        a = TrajectoryLoader([tmp_path / "set0.lammpstrj",
                              tmp_path / "set1.lammpstrj"],
                             timestep=0.01).load()
        b = TrajectoryLoader([tmp_path / "set0.lammpstrj",
                              tmp_path / "set2.lammpstrj"],
                             timestep=0.01).load()
        assert not np.allclose(a.positions[2:], b.positions[2:])

    def test_multifile_mismatched_atoms_rejected(self, traj, tmp_path):
        p1 = tmp_path / "a.lammpstrj"
        p2 = tmp_path / "b.lammpstrj"
        lammps_io.write_lammps_dump(p1, traj.atom_types, traj.positions[:1],
                                    traj.velocities[:1], traj.box_matrix)
        lammps_io.write_lammps_dump(p2, traj.atom_types[:-1],
                                    traj.positions[1:, :-1],
                                    traj.velocities[1:, :-1],
                                    traj.box_matrix)
        with pytest.raises(ValueError, match="atom count"):
            TrajectoryLoader([p1, p2], timestep=0.01, use_cache=False).load()

    def test_pattern_without_match_errors(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="pattern"):
            TrajectoryLoader(str(tmp_path / "nope.*.lammpstrj"))

    def test_binary_dump_roundtrip(self, traj, tmp_path):
        """Modern (revision-2 DUMPCUSTOM) binary dump through the loader."""
        path = tmp_path / "t.bin"
        lammps_io.write_lammps_dump_binary(
            path, traj.atom_types, traj.positions, traj.velocities,
            traj.box_matrix)
        got = TrajectoryLoader(str(path), timestep=0.01,
                               use_cache=False).load()
        np.testing.assert_array_equal(got.atom_types, traj.atom_types)
        np.testing.assert_allclose(got.positions, traj.positions, atol=1e-9)
        np.testing.assert_allclose(got.velocities, traj.velocities, atol=1e-9)
        np.testing.assert_allclose(got.box_matrix, traj.box_matrix, atol=1e-9)

    def test_binary_dump_sniffed_without_bin_suffix(self, traj, tmp_path):
        """A binary dump misnamed .lammpstrj still parses (NUL sniff)."""
        path = tmp_path / "t.lammpstrj"
        lammps_io.write_lammps_dump_binary(
            path, traj.atom_types, traj.positions, traj.velocities,
            traj.box_matrix)
        types, pos, _, _ = lammps_io.parse_lammps_dump(path)
        np.testing.assert_allclose(pos, traj.positions, atol=1e-9)

    def test_binary_dump_legacy_atom_layout(self, traj, tmp_path):
        """Pre-magic-string header: columns inferred as id type xs ys zs."""
        path = tmp_path / "legacy.bin"
        lammps_io.write_lammps_dump_binary(
            path, traj.atom_types, traj.positions, traj.velocities,
            traj.box_matrix, legacy=True)
        types, pos, vel, box = lammps_io.parse_lammps_dump_binary(path)
        np.testing.assert_array_equal(types, traj.atom_types)
        np.testing.assert_allclose(pos, traj.positions, atol=1e-9)
        assert not vel.any()                       # legacy layout has no vx

    def test_binary_dump_multichunk(self, traj, tmp_path):
        """Per-MPI-rank chunks concatenate into one frame."""
        path = tmp_path / "chunks.bin"
        lammps_io.write_lammps_dump_binary(
            path, traj.atom_types, traj.positions, traj.velocities,
            traj.box_matrix, nchunk=3)
        _, pos, _, _ = lammps_io.parse_lammps_dump_binary(path)
        np.testing.assert_allclose(pos, traj.positions, atol=1e-9)

    def test_binary_dump_gzipped(self, traj, tmp_path):
        import gzip
        raw = tmp_path / "t.bin"
        lammps_io.write_lammps_dump_binary(
            raw, traj.atom_types, traj.positions, traj.velocities,
            traj.box_matrix)
        gz = tmp_path / "t.bin.gz"
        gz.write_bytes(gzip.compress(raw.read_bytes()))
        got = TrajectoryLoader(str(gz), timestep=0.01, use_cache=False).load()
        np.testing.assert_allclose(got.positions, traj.positions, atol=1e-9)

    def test_binary_dump_big_endian(self, tmp_path):
        """A big-endian revision-2 snapshot parses via byte-order sniff."""
        import struct
        magic = b"DUMPCUSTOM"
        cols = b"id type x y z"
        buf = struct.pack(">q", -len(magic)) + magic
        buf += struct.pack(">iiqqi", 0x0001, 0x0002, 0, 1, 0)   # ts natoms tri
        buf += struct.pack(">6i", *([0] * 6))
        buf += struct.pack(">6d", 0, 10, 0, 10, 0, 10)
        buf += struct.pack(">i", 5)                             # size_one
        buf += struct.pack(">i", 0) + struct.pack(">b", 0)      # units, time
        buf += struct.pack(">i", len(cols)) + cols
        buf += struct.pack(">ii", 1, 5)                         # nchunk, n
        buf += struct.pack(">5d", 1.0, 6.0, 2.5, 5.0, 7.5)
        path = tmp_path / "be.bin"
        path.write_bytes(buf)
        types, pos, _, _ = lammps_io.parse_lammps_dump_binary(path)
        np.testing.assert_array_equal(types, [6])
        np.testing.assert_allclose(pos[0, 0], [2.5, 5.0, 7.5])

    def test_binary_dump_legacy_custom_rejected(self, traj, tmp_path):
        """Legacy header with a non-atom-style width: clear error, since the
        file records no column names."""
        import struct
        path = tmp_path / "cust.bin"
        buf = struct.pack("<qqi", 0, 1, 0)
        buf += struct.pack("<6i", *([0] * 6))
        buf += struct.pack("<6d", 0, 10, 0, 10, 0, 10)
        buf += struct.pack("<i", 7)                             # size_one
        buf += struct.pack("<ii", 1, 7)
        buf += struct.pack("<7d", *range(7))
        path.write_bytes(buf)
        with pytest.raises(ValueError, match="column names"):
            lammps_io.parse_lammps_dump_binary(path)

    def test_binary_dump_truncated_errors(self, traj, tmp_path):
        path = tmp_path / "t.bin"
        lammps_io.write_lammps_dump_binary(
            path, traj.atom_types, traj.positions, traj.velocities,
            traj.box_matrix)
        data = path.read_bytes()
        # Cuts chosen to land mid-structure (a frame-aligned cut is a
        # legitimate shorter trajectory, not an error).
        frame = len(data) // 4                    # writer emits 4 equal frames
        for cut in (9, 40, frame + 21, len(data) - 3):
            (tmp_path / "cut.bin").write_bytes(data[:cut])
            with pytest.raises(ValueError):
                lammps_io.parse_lammps_dump_binary(tmp_path / "cut.bin")

    def test_multifile_cache_roundtrip(self, traj, tmp_path):
        for k in range(2):
            lammps_io.write_lammps_dump(
                tmp_path / f"c{k}.lammpstrj", traj.atom_types,
                traj.positions[2 * k:2 * k + 2],
                traj.velocities[2 * k:2 * k + 2], traj.box_matrix)
        pat = str(tmp_path / "c*.lammpstrj")
        first = TrajectoryLoader(pat, timestep=0.01).load()
        assert list(tmp_path.glob("c0.x2.*.positions.npy"))
        again = TrajectoryLoader(pat, timestep=0.01).load()
        np.testing.assert_allclose(again.positions, first.positions)

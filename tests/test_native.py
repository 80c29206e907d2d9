"""Native (C++) dump parser vs the pure-Python parser."""

import time

import numpy as np
import pytest

from pyslice_tpu.io import lammps as lammps_io
from pyslice_tpu.io.native_loader import get_lib, parse_lammps_dump_native
from tests.fixtures import hbn_thermal


@pytest.fixture(scope="module")
def dump_file(tmp_path_factory):
    traj = hbn_thermal(n_frames=10, sigma=0.05, nx=3, ny=3)
    path = tmp_path_factory.mktemp("native") / "t.lammpstrj"
    lammps_io.write_lammps_dump(path, traj.atom_types, traj.positions,
                                traj.velocities, traj.box_matrix)
    return path, traj


def test_native_builds():
    assert get_lib() is not None, "native parser failed to build"


def test_native_matches_python(dump_file):
    path, traj = dump_file
    native = parse_lammps_dump_native(path)
    assert native is not None
    nt, npos, nvel, nbox = native
    pt_, ppos, pvel, pbox = lammps_io.parse_lammps_dump(path)
    np.testing.assert_array_equal(nt, pt_)
    np.testing.assert_allclose(npos, ppos, rtol=1e-12)
    np.testing.assert_allclose(nvel, pvel, rtol=1e-12)
    np.testing.assert_allclose(nbox, pbox, rtol=1e-12)


def test_native_rejects_triclinic(tmp_path):
    p = tmp_path / "tri.lammpstrj"
    p.write_text(
        "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
        "ITEM: BOX BOUNDS xy xz yz pp pp pp\n"
        "0.0 11.0 1.0\n0.0 5.0 0.0\n0.0 8.0 0.0\n"
        "ITEM: ATOMS id type x y z\n1 1 1.0 1.0 1.0\n")
    assert parse_lammps_dump_native(p) is None   # falls back to Python


def test_native_rejects_scaled_coords(tmp_path):
    p = tmp_path / "s.lammpstrj"
    p.write_text(
        "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
        "ITEM: BOX BOUNDS pp pp pp\n0 4.0\n0 5.0\n0 8.0\n"
        "ITEM: ATOMS id type xs ys zs\n1 1 0.25 0.5 0.125\n")
    assert parse_lammps_dump_native(p) is None


def test_native_image_flags(tmp_path):
    p = tmp_path / "i.lammpstrj"
    p.write_text(
        "ITEM: TIMESTEP\n0\nITEM: NUMBER OF ATOMS\n1\n"
        "ITEM: BOX BOUNDS pp pp pp\n0 10.0\n0 10.0\n0 10.0\n"
        "ITEM: ATOMS id type x y z ix iy iz\n"
        "1 1 1.0 2.0 3.0 1 0 -1\n")
    out = parse_lammps_dump_native(p)
    assert out is not None
    _, pos, _, _ = out
    np.testing.assert_allclose(pos[0, 0], [11.0, 2.0, -7.0])


def test_native_is_faster(dump_file):
    """Sanity: the native path should beat pure Python on a real file."""
    path, _ = dump_file
    # Warm both paths (library load / interpreter caches), then take the
    # best of 5 — a single cold measurement on a small file is all noise.
    parse_lammps_dump_native(path)
    lammps_io.parse_lammps_dump(path)

    def best_of(fn, n=5):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(path)
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = best_of(parse_lammps_dump_native)
    t_py = best_of(lammps_io.parse_lammps_dump)
    # Not asserted as a hard multiple (CI noise); just require it not slower.
    assert t_native < t_py * 1.5, (t_native, t_py)

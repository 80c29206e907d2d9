"""Streaming trajectory ingest (io/stream.py).

Bit-parity against the eager TrajectoryLoader across formats (text, gz,
binary, multi-file patterns, PBC-crossing atoms), prefetch on/off, and an
end-to-end check that feeding StreamingTACAW from a TrajectoryStream
matches the eager-load pipeline exactly.
"""

import gzip
import shutil

import numpy as np
import pytest

from pyslice_tpu.io.lammps import (write_lammps_dump,
                                   write_lammps_dump_binary)
from pyslice_tpu.io.loader import TrajectoryLoader
from pyslice_tpu.io.stream import TrajectoryStream


def _traj(n_frames=10, n_atoms=6, seed=0, crossing=True):
    """Wrapped trajectory with atoms drifting through the boundary."""
    rng = np.random.default_rng(seed)
    box = np.array([8.0, 9.0, 10.0])
    base = rng.random((n_atoms, 3)) * box
    drift = rng.normal(0, 0.2, (n_atoms, 3))
    if crossing:
        drift[0] = (0.9, 0.0, 0.0)                # marches through x
    pos = np.stack([base + t * drift for t in range(n_frames)])
    wrapped = np.mod(pos, box)
    types = rng.integers(1, 3, n_atoms).astype(np.int32)
    vel = np.zeros_like(pos)
    return types, wrapped, vel, np.diag(box)


def _concat_blocks(stream):
    idx_all, blocks = [], []
    for idx, block in stream.blocks():
        idx_all.append(idx)
        blocks.append(block)
    return np.concatenate(idx_all), np.concatenate(blocks)


@pytest.mark.parametrize("prefetch", [0, 2])
@pytest.mark.parametrize("native", [True, False])
def test_stream_matches_loader_text(tmp_path, prefetch, native,
                                    monkeypatch):
    if not native:
        # force the pure-Python frame iterator (the general-case path)
        from pyslice_tpu.io import native_loader
        monkeypatch.setattr(native_loader, "get_lib", lambda: None)
    types, wrapped, vel, box = _traj()
    f = tmp_path / "dump.lammpstrj"
    write_lammps_dump(f, types, wrapped, vel, box)
    eager = TrajectoryLoader(str(f), use_cache=False).load()
    st = TrajectoryStream(str(f), block_frames=3, prefetch=prefetch)
    idx, pos = _concat_blocks(st)
    np.testing.assert_array_equal(idx, np.arange(10))
    # per-frame stitching sums deltas incrementally; the eager unwrap uses
    # one cumsum — identical math, f64 summation-order noise only
    np.testing.assert_allclose(pos, eager.positions, rtol=0, atol=1e-12)
    np.testing.assert_array_equal(st.atom_types, eager.atom_types)
    np.testing.assert_array_equal(st.box_matrix, eager.box_matrix)
    assert st.count_frames() == 10
    # continuity unwrap actually engaged: the marching atom left the box
    assert pos[-1, 0, 0] > 8.0


def test_stream_matches_loader_gz_and_multifile(tmp_path):
    types, wrapped, vel, box = _traj(n_frames=9)
    # three files x three frames, the middle one gzipped
    paths = []
    for k in range(3):
        f = tmp_path / f"dump.{k}.lammpstrj"
        write_lammps_dump(f, types, wrapped[3 * k:3 * k + 3],
                          vel[:3], box)
        paths.append(f)
    gz = paths[1].with_suffix(".lammpstrj.gz")
    with open(paths[1], "rb") as src, gzip.open(gz, "wb") as dst:
        shutil.copyfileobj(src, dst)
    paths[1].unlink()
    files = [str(paths[0]), str(gz), str(paths[2])]
    eager = TrajectoryLoader(files, use_cache=False).load()
    st = TrajectoryStream(files, block_frames=2)
    idx, pos = _concat_blocks(st)
    np.testing.assert_array_equal(idx, np.arange(9))
    np.testing.assert_allclose(pos, eager.positions, rtol=0, atol=1e-12)
    assert st.count_frames() == 9


def test_stream_binary_file(tmp_path):
    types, wrapped, vel, box = _traj(n_frames=5)
    f = tmp_path / "dump.bin"
    write_lammps_dump_binary(f, types, wrapped, vel, box)
    eager = TrajectoryLoader(str(f), use_cache=False).load()
    st = TrajectoryStream(str(f), block_frames=2)
    idx, pos = _concat_blocks(st)
    np.testing.assert_allclose(pos, eager.positions, rtol=0, atol=1e-12)
    assert st.count_frames() == 5


def test_stream_atom_mapping_and_errors(tmp_path):
    types, wrapped, vel, box = _traj(n_frames=4)
    f = tmp_path / "dump.lammpstrj"
    write_lammps_dump(f, types, wrapped, vel, box)
    st = TrajectoryStream(str(f), atom_mapping={1: "B", 2: 7},
                          block_frames=4)
    assert set(np.unique(st.atom_types)) <= {5, 7}
    with pytest.raises(ValueError, match="block_frames"):
        TrajectoryStream(str(f), block_frames=0)
    with pytest.raises(FileNotFoundError):
        TrajectoryStream(str(tmp_path / "missing.lammpstrj"))


def test_stream_feeds_streaming_tacaw(tmp_path):
    """End to end: StreamingTACAW fed block-by-block from a
    TrajectoryStream equals the same engine fed from the eager loader."""
    import jax.numpy as jnp

    from pyslice_tpu.core.grids import grid_from_trajectory
    from pyslice_tpu.engine.pipeline import SimSpec
    from pyslice_tpu.engine.streaming import StreamingTACAW
    from pyslice_tpu.physics.potential import make_plan
    from pyslice_tpu.physics.probe import Probe

    types, wrapped, vel, box = _traj(n_frames=8, n_atoms=5, crossing=False)
    f = tmp_path / "dump.lammpstrj"
    write_lammps_dump(f, types, wrapped, vel, box)

    traj = TrajectoryLoader(str(f), use_cache=False,
                            atom_mapping={1: 5, 2: 7}).load()
    grid = grid_from_trajectory(traj, sampling=0.5, slice_thickness=2.0)
    plan = make_plan(grid.xs, grid.ys, grid.zs, traj.positions,
                     traj.atom_types)
    spec = SimSpec.create(grid, plan, 100e3)
    probe = Probe(grid.xs, grid.ys, 15.0, 100e3)
    probes = probe.array[None]

    def run(frame_source):
        st = StreamingTACAW(spec, probes, 8, timestep=0.005,
                            frequencies=[0.0, 10.0])
        for idx, pos in frame_source:
            st.add_frame_block(list(idx), jnp.asarray(pos, jnp.float32))
        return st.spectrum()

    eager_blocks = [(np.arange(4 * k, 4 * k + 4),
                     traj.positions[4 * k:4 * k + 4]) for k in range(2)]
    s_eager = run(eager_blocks)
    stream = TrajectoryStream(str(f), atom_mapping={1: 5, 2: 7},
                              block_frames=4)
    s_stream = run(stream.blocks())
    np.testing.assert_array_equal(np.asarray(s_eager),
                                  np.asarray(s_stream))


def test_stream_guards(tmp_path):
    """Loud failures where parity with the eager loader is impossible:
    NPT (box changes between frames), mixed flag/flagless frames in one
    file, multi-file type mismatch, zero-frame file; plus early consumer
    abandonment must not deadlock the prefetch worker."""
    types, wrapped, vel, box = _traj(n_frames=4, crossing=False)

    # NPT: grow the box on the later frames
    f = tmp_path / "npt.lammpstrj"
    with open(f, "w") as fh:
        for t in range(4):
            scale = 1.0 + 0.05 * t
            fh.write("ITEM: TIMESTEP\n%d\n" % t)
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % wrapped.shape[1])
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                fh.write("0.0 %.6f\n" % (box[d, d] * scale))
            fh.write("ITEM: ATOMS id type x y z\n")
            for a in range(wrapped.shape[1]):
                fh.write("%d %d %.6f %.6f %.6f\n"
                         % (a + 1, types[a], *wrapped[t, a]))
    st = TrajectoryStream(str(f), block_frames=2)
    with pytest.raises(ValueError, match="box changed"):
        _concat_blocks(st)

    # mixed flags within one file
    f2 = tmp_path / "mixed.lammpstrj"
    with open(f2, "w") as fh:
        for t in range(4):
            fh.write("ITEM: TIMESTEP\n%d\n" % t)
            fh.write("ITEM: NUMBER OF ATOMS\n%d\n" % wrapped.shape[1])
            fh.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                fh.write("0.0 %.6f\n" % box[d, d])
            if t < 2:
                fh.write("ITEM: ATOMS id type x y z ix iy iz\n")
                for a in range(wrapped.shape[1]):
                    fh.write("%d %d %.6f %.6f %.6f 0 0 0\n"
                             % (a + 1, types[a], *wrapped[t, a]))
            else:
                fh.write("ITEM: ATOMS id type x y z\n")
                for a in range(wrapped.shape[1]):
                    fh.write("%d %d %.6f %.6f %.6f\n"
                             % (a + 1, types[a], *wrapped[t, a]))
    with pytest.raises(ValueError, match="mix image-flag"):
        _concat_blocks(TrajectoryStream(str(f2), block_frames=2))

    # multi-file type mismatch
    fa = tmp_path / "a.lammpstrj"
    fb = tmp_path / "b.lammpstrj"
    write_lammps_dump(fa, types, wrapped[:2], vel[:2], box)
    types_b = types.copy()
    types_b[0] = 3 - types_b[0]       # swap a species
    write_lammps_dump(fb, types_b, wrapped[2:], vel[:2], box)
    with pytest.raises(ValueError, match="types differ"):
        _concat_blocks(TrajectoryStream([str(fa), str(fb)],
                                        block_frames=2))

    # zero frames
    f3 = tmp_path / "empty.lammpstrj"
    f3.write_text("# not a dump\n")
    with pytest.raises(ValueError, match="No frames found"):
        TrajectoryStream(str(f3))

    # early abandonment: worker must exit (no deadlock, no leak)
    import threading
    f4 = tmp_path / "big.lammpstrj"
    types4, wrapped4, vel4, box4 = _traj(n_frames=20, crossing=False)
    write_lammps_dump(f4, types4, wrapped4, vel4, box4)
    before = threading.active_count()
    st4 = TrajectoryStream(str(f4), block_frames=1, prefetch=1)
    for _ in st4.blocks():
        break                          # abandon immediately
    import time
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "prefetch worker leaked"

"""Trajectory data-model behavior (reference trajectory.py:8-237 parity)."""

import numpy as np
import pytest

from pyslice_tpu.data.trajectory import Trajectory
from tests.fixtures import hbn_monolayer


def simple_traj(n_frames=2, n_atoms=3):
    rng = np.random.default_rng(0)
    return Trajectory(
        atom_types=np.arange(1, n_atoms + 1),
        positions=rng.random((n_frames, n_atoms, 3)) * 5,
        velocities=rng.random((n_frames, n_atoms, 3)),
        box_matrix=np.diag([5.0, 6.0, 7.0]),
        timestep=0.005,
    )


class TestValidation:
    def test_shape_errors(self):
        t = simple_traj()
        with pytest.raises(ValueError, match="positions"):
            Trajectory(t.atom_types, t.positions[..., :2], t.velocities,
                       t.box_matrix, 1.0)
        with pytest.raises(ValueError, match="box_matrix"):
            Trajectory(t.atom_types, t.positions, t.velocities,
                       np.eye(2), 1.0)
        with pytest.raises(ValueError, match="Frame count"):
            Trajectory(t.atom_types, t.positions, t.velocities[:1],
                       t.box_matrix, 1.0)
        with pytest.raises(ValueError, match="Atom count"):
            Trajectory(t.atom_types[:2], t.positions, t.velocities,
                       t.box_matrix, 1.0)

    def test_properties(self):
        t = simple_traj(4, 6)
        assert t.n_frames == 4 and t.n_atoms == 6
        box = np.array([[5, 1, 2], [0, 6, 3], [0, 0, 7]], dtype=float)
        t2 = Trajectory(t.atom_types, t.positions, t.velocities, box, 1.0)
        np.testing.assert_array_equal(t2.box_tilts, [1, 2, 3])


class TestTile:
    def test_counts_and_offsets(self):
        t = simple_traj(2, 3)
        t2 = t.tile_positions((2, 1, 3))
        assert t2.n_atoms == 3 * 6
        assert t2.n_frames == 2
        # tile (i=1, j=0, k=0) block: offset by box @ (1,0,0) = (5,0,0)
        # tile ordering: i outer, then j, then k -> tile index 3 is (1,0,0)
        blk = t2.positions[:, 3 * 3:4 * 3, :]
        np.testing.assert_allclose(blk, t.positions + np.array([5.0, 0, 0]))
        np.testing.assert_allclose(np.diag(t2.box_matrix), [10.0, 6.0, 21.0])

    def test_tilted_box_offsets(self):
        box = np.array([[5, 1, 0], [0, 6, 0], [0, 0, 7]], dtype=float)
        t = simple_traj(1, 2)
        t = Trajectory(t.atom_types, t.positions, t.velocities, box, 1.0)
        t2 = t.tile_positions((1, 2, 1))
        # second tile offset = box @ (0,1,0) = column 1 = (1, 6, 0)
        np.testing.assert_allclose(
            t2.positions[0, 2:4] - t.positions[0],
            np.broadcast_to([1.0, 6.0, 0.0], (2, 3)))


class TestSlicing:
    def test_slice_positions_by_mean(self):
        pos = np.array([[[1.0, 1, 1], [4.0, 1, 1]],
                        [[1.2, 1, 1], [4.2, 1, 1]]])
        t = Trajectory(np.array([5, 7]), pos, np.zeros_like(pos),
                       np.diag([5.0, 5, 5]), 1.0)
        t2 = t.slice_positions(x_range=(0, 2))
        assert t2.n_atoms == 1
        assert t2.box_matrix[0, 0] == 2.0
        # inclusive bounds
        t3 = t.slice_positions(x_range=(1.1, 4.1))
        assert t3.n_atoms == 2
        with pytest.raises(ValueError, match="0 atoms"):
            t.slice_positions(x_range=(100, 200))
        with pytest.raises(ValueError, match="invalid"):
            t.slice_positions(x_range=(2, 1))

    def test_slice_timesteps(self):
        t = simple_traj(5, 2)
        t2 = t.slice_timesteps([0, 2, 4])
        assert t2.n_frames == 3
        np.testing.assert_array_equal(t2.positions[1], t.positions[2])
        with pytest.raises(ValueError):
            t.slice_timesteps([])
        with pytest.raises(ValueError):
            t.slice_timesteps([7])


class TestDisplacements:
    def test_uniform_default(self):
        t = hbn_monolayer()
        d = t.generate_random_displacements(10, 0.3, seed=1)
        assert d.n_frames == 10
        delta = d.positions - t.positions[0]
        # reference semantics: uniform in [0, sigma), uncentered
        assert delta.min() >= 0.0 and delta.max() < 0.3
        # velocities broadcast from frame 0
        np.testing.assert_array_equal(d.velocities[3], t.velocities[0])

    def test_gaussian_option(self):
        t = hbn_monolayer()
        d = t.generate_random_displacements(200, 0.1, distribution="gaussian",
                                            seed=2)
        delta = (d.positions - t.positions[0]).ravel()
        assert abs(delta.mean()) < 0.01
        assert np.std(delta) == pytest.approx(0.1, rel=0.1)

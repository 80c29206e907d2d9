#!/usr/bin/env python
"""Generate an example LAMMPS trajectory (synthetic thermal hBN monolayer).

The reference repo's trajectory fixtures were never published with it; this
produces a drop-in `monolayer.lammpstrj` so the CLI / demo run out of the
box:

    python examples/make_fixture.py --cells 8 6 --frames 100
    python -m pyslice_tpu run --trajectory examples/monolayer.lammpstrj \\
        --timestep 0.005 --atom-mapping 1=B,2=N --mode tacaw
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from pyslice_tpu.data.trajectory import Trajectory
from pyslice_tpu.io.lammps import write_lammps_dump


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", nargs=2, type=int, default=[8, 6],
                    metavar=("NX", "NY"))
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--sigma", type=float, default=0.05,
                    help="thermal displacement scale (Angstrom)")
    ap.add_argument("--out", default=str(Path(__file__).parent
                                         / "monolayer.lammpstrj"))
    args = ap.parse_args()

    a, by, lz = 2.504, 2.504 * np.sqrt(3.0), 6.784
    cell = np.array([[0.0, 0.0, lz / 4], [a / 2, by / 6, lz / 4],
                     [a / 2, by / 2, lz / 4], [0.0, by / 2 + by / 6, lz / 4]])
    nx, ny = args.cells
    cells = [cell + [i * a, j * by, 0.0]
             for i in range(nx) for j in range(ny)]
    pos = np.concatenate(cells)[None]
    types = np.tile(np.array([1, 2, 1, 2], np.int32), nx * ny)  # 1=B, 2=N
    traj = Trajectory(types, pos, np.zeros_like(pos),
                      np.diag([nx * a, ny * by, lz]), 0.005)
    traj = traj.generate_random_displacements(args.frames, args.sigma, seed=0)

    write_lammps_dump(args.out, traj.atom_types, traj.positions,
                      traj.velocities, traj.box_matrix)
    print(f"wrote {args.out}: {traj.n_frames} frames, {traj.n_atoms} atoms, "
          f"box {np.diag(traj.box_matrix).round(2)}")


if __name__ == "__main__":
    main()

"""Synthetic test fixtures.

The reference snapshot's trajectory fixtures were stripped
(.MISSING_LARGE_BLOBS), so tests generate their own: an orthorhombic hBN
monolayer built from the published cell parameters (a = 2.504 A,
c = 6.784 A; hBN.cif / SpringerMaterials SD1923917) plus uniform thermal
displacements via Trajectory.generate_random_displacements.
"""

from __future__ import annotations

import numpy as np

from pyslice_tpu.data.trajectory import Trajectory

HBN_A = 2.504      # hexagonal lattice parameter, Angstrom
HBN_C = 6.784      # out-of-plane repeat (bulk), Angstrom


def hbn_monolayer(nx: int = 2, ny: int = 2, lz: float = 6.784,
                  timestep: float = 0.005) -> Trajectory:
    """Orthorhombic hBN monolayer supercell, nx x ny rectangular cells.

    The rectangular cell (a, sqrt(3) a) holds 4 atoms (2 B + 2 N) of the
    honeycomb with bond length a/sqrt(3). The layer sits at z = lz/4.
    """
    a = HBN_A
    by = np.sqrt(3.0) * a
    z0 = lz / 4.0
    base = np.array([
        [0.0, 0.0, z0],                 # B
        [a / 2, by / 6, z0],            # N  (y = a * sqrt(3)/6)
        [a / 2, by / 2, z0],            # B
        [0.0, by / 2 + by / 6, z0],     # N
    ])
    types_cell = np.array([5, 7, 5, 7], dtype=np.int32)

    cells = []
    types = []
    for i in range(nx):
        for j in range(ny):
            off = np.array([i * a, j * by, 0.0])
            cells.append(base + off)
            types.append(types_cell)
    pos = np.concatenate(cells)[None]    # (1, n_atoms, 3)
    atom_types = np.concatenate(types)
    box = np.diag([nx * a, ny * by, lz])
    return Trajectory(atom_types=atom_types, positions=pos,
                      velocities=np.zeros_like(pos), box_matrix=box,
                      timestep=timestep)


def hbn_stack(n_layers: int = 3, nx: int = 2, ny: int = 2,
              timestep: float = 0.005) -> Trajectory:
    """AA'-stacked multilayer hBN: ``n_layers`` monolayers at the bulk
    interlayer spacing c/2 = 3.392 A, B and N exchanged on alternate
    layers. Multi-slice occupancy makes propagation genuinely dynamical
    (needed by tests of tilt/precession, which are pure k-space phases
    and provably cannot change a single-slice diffraction intensity)."""
    a = HBN_A
    by = np.sqrt(3.0) * a
    dzl = HBN_C / 2.0
    lz = (n_layers + 1) * dzl
    base = np.array([
        [0.0, 0.0, 0.0],
        [a / 2, by / 6, 0.0],
        [a / 2, by / 2, 0.0],
        [0.0, by / 2 + by / 6, 0.0],
    ])
    cell_b = np.array([5, 7, 5, 7], dtype=np.int32)   # B N B N
    cell_n = np.array([7, 5, 7, 5], dtype=np.int32)   # N B N B (AA')
    cells, types = [], []
    for layer in range(n_layers):
        z = dzl / 2.0 + layer * dzl
        for i in range(nx):
            for j in range(ny):
                off = np.array([i * a, j * by, z])
                cells.append(base + off)
                types.append(cell_b if layer % 2 == 0 else cell_n)
    pos = np.concatenate(cells)[None]
    box = np.diag([nx * a, ny * by, lz])
    return Trajectory(atom_types=np.concatenate(types), positions=pos,
                      velocities=np.zeros_like(pos), box_matrix=box,
                      timestep=timestep)


def hbn_thermal(n_frames: int = 8, sigma: float = 0.05, nx: int = 2,
                ny: int = 2, seed: int = 0, timestep: float = 0.005) -> Trajectory:
    """Monolayer + synthetic thermal frames (deterministic)."""
    return hbn_monolayer(nx, ny, timestep=timestep).generate_random_displacements(
        n_frames, sigma, seed=seed)


def hbn_filled_box(lx: float, n_frames: int, sigma: float = 0.05,
                   seed: int = 0, lz: float = 6.784) -> Trajectory:
    """hBN monolayer filling (as many whole cells as fit in) an lx x lx
    SQUARE box + thermal frames. The square box lets tests pin an exact
    grid: lx=102.35 at sampling 0.1 -> int(1023.5)+1 = 1024 points on both
    axes — the production/headline shape (BASELINE.md config 2)."""
    a = HBN_A
    by = np.sqrt(3.0) * a
    ncx, ncy = int(lx // a), int(lx // by)
    z0 = lz / 4.0
    base = np.array([
        [0.0, 0.0, z0],
        [a / 2, by / 6, z0],
        [a / 2, by / 2, z0],
        [0.0, by / 2 + by / 6, z0],
    ])
    cells = [base + np.array([i * a, j * by, 0.0])
             for i in range(ncx) for j in range(ncy)]
    pos = np.concatenate(cells)[None]
    types = np.tile(np.array([5, 7, 5, 7], dtype=np.int32), ncx * ncy)
    traj = Trajectory(atom_types=types, positions=pos,
                      velocities=np.zeros_like(pos),
                      box_matrix=np.diag([lx, lx, lz]), timestep=0.005)
    return traj.generate_random_displacements(n_frames, sigma, seed=seed)

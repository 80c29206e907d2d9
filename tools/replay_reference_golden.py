"""Best-effort replay of the surviving reference golden (round-3 item 8).

/root/reference/src/unittests/haadf-test.npy is the ONLY numerical artifact
produced in the original authors' environment (written by 04_haadf.py:59-66).
Its input fixture hBN_truncated.lammpstrj was stripped from the snapshot
(.MISSING_LARGE_BLOBS:2), so exact replay is impossible: the golden depends
on the MD trajectory's thermal displacements, frame count (the seed-5
shuffle picks 3 of n_frames — n_frames unknown), and box height lz (sets
the slice count). This script reconstructs everything the recipe DOES pin
down and quantifies how close a synthetic-thermal stand-in gets:

  * lattice: monolayer hBN at the MD-relaxed constant a = 2.4907733...
    (04_haadf.py:17 — NOT the cif's 2.504), orthorhombic b = a*sqrt(3)/2;
  * region: slice_positions([0, 10a], [0, 10b]) (04_haadf.py:23);
  * 3 thermal frames (np.random.seed(5) shuffle — the SELECTION is pinned,
    the displacements are not);
  * scan: probe_grid([a, 3a], [b, 3b], 14, 16) (04_haadf.py:28);
  * calculator: aperture=30 mrad, 100 kV, sampling=0.1, slice 0.5
    (04_haadf.py:31) -> HAADFData.calculateADF() amplitude convention.

Usage: python tools/replay_reference_golden.py
Prints the reference residual dz = sum((F-D)^2)/sum(F^2) (the reference's
own oracle, 04_haadf.py:63) plus structural agreement metrics; the analysis
conclusion lives in PARITY.md and tests/test_reference_golden.py.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

GOLDEN = Path("/root/reference/src/unittests/haadf-test.npy")

# 04_haadf.py:17 — the MD-relaxed lattice constants the recipe hardcodes.
A = 2.4907733333333337
B = 2.1570729817355123          # = A * sqrt(3) / 2


def reconstructed_trajectory(n_frames=3, sigma=0.05, seed=5, lz=6.784,
                             distribution="uniform"):
    """Monolayer hBN on the MD lattice, 10x10 orthorhombic half-cells,
    synthetic thermal frames (the best available stand-in for the stripped
    MD fixture). ``distribution='uniform'`` matches the reference's
    generate_random_displacements (quirk #10)."""
    from pyslice_tpu.data.trajectory import Trajectory

    # Honeycomb as two triangular sublattices: rows of the triangular
    # lattice sit at y = j*b (b = sqrt(3)/2 * a) with alternate rows
    # x-shifted by a/2; the second sublattice is the first translated by
    # (0, 2b/3) (the nearest-neighbor bond a/sqrt(3) along +y). Boron on
    # sublattice 1, nitrogen on sublattice 2 — every B has 3 N neighbors.
    base = []
    types = []
    z0 = lz / 2.0
    for j in range(10):                     # rows fill [0, 10b)
        xoff = (j % 2) * (A / 2.0)
        y_a = j * B
        y_b = y_a + 2.0 * B / 3.0
        for i in range(10):                 # columns fill [0, 10a)
            x = i * A + xoff
            base.append((x % (10 * A), y_a, z0))
            types.append(5)                 # B
            base.append((x % (10 * A), y_b % (10 * B), z0))
            types.append(7)                 # N
    base = np.asarray(base)
    types = np.asarray(types, np.int32)
    traj = Trajectory(
        atom_types=types,
        positions=base[None],
        velocities=np.zeros((1,) + base.shape),
        box_matrix=np.diag([10 * A, 10 * B, lz]),
        timestep=0.005)
    return traj.generate_random_displacements(n_frames, sigma,
                                              distribution=distribution,
                                              seed=seed)


def run_recipe(traj):
    from pyslice_tpu.analysis.haadf import HAADFData
    from pyslice_tpu.engine.calculator import MultisliceCalculator
    from pyslice_tpu.physics.probe import probe_grid

    xy = probe_grid([A, 3 * A], [B, 3 * B], 14, 16)
    calc = MultisliceCalculator()
    calc.setup(traj, aperture=30, voltage_eV=100e3, sampling=0.1,
               slice_thickness=0.5, probe_positions=xy, use_cache=False)
    wf = calc.run(progress=False)
    return HAADFData(wf).calculateADF()


def compare(adf, golden):
    F, D = np.abs(adf), np.abs(golden)
    dz = np.sum((F - D) ** 2) / np.sum(F ** 2)      # 04_haadf.py:63
    # scale-free structural agreement
    f = (F - F.mean()) / F.std()
    d = (D - D.mean()) / D.std()
    corr = float(np.mean(f * d))
    ratio = float(F.mean() / D.mean())
    return dz, corr, ratio


if __name__ == "__main__":
    golden = np.load(GOLDEN)
    print(f"golden: shape {golden.shape} mean {golden.mean():.2f} "
          f"min {golden.min():.2f} max {golden.max():.2f}")
    for sigma in (0.03, 0.05, 0.08):
        traj = reconstructed_trajectory(sigma=sigma)
        adf = run_recipe(traj)
        dz, corr, ratio = compare(adf, golden)
        print(f"sigma={sigma}: dz={dz:.4f} corr={corr:.3f} "
              f"mean-ratio={ratio:.3f} "
              f"(recon mean {adf.mean():.2f} min {adf.min():.2f} "
              f"max {adf.max():.2f})")

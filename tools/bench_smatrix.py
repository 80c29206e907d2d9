#!/usr/bin/env python
"""PRISM/S-matrix STEM benchmark on the TPU (engine.smatrix).

Measures, at a production HAADF shape (1024^2 grid, 30 mrad, 100 keV):
  1. S-matrix build (propagate the f-subsampled beam basis, one frame)
  2. probe synthesis + annular reduction for P probes
and compares against the direct path's propagation cost for the same P
(P * nz slice-steps at the measured fused-kernel rate).

Usage: python tools/bench_smatrix.py [f] [n_probes ...]
       (defaults: f=8, P = 224 2048)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from pyslice_tpu.analysis.detectors import annular_mask
    from pyslice_tpu.core.constants import wavelength
    from pyslice_tpu.core.grids import grid_from_box
    from pyslice_tpu.engine.smatrix import (build_beams, compute_smatrix,
                                            smatrix_reduce)
    from pyslice_tpu.physics.potential import make_plan
    from pyslice_tpu.physics.probe import probe_grid

    f = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    probe_counts = [int(a) for a in sys.argv[2:]] or [224, 2048]

    lx = 102.35
    grid = grid_from_box(lx, lx, 6.784, 0.1, 0.5, fast_grid=True)
    log(f"grid {grid.nx}x{grid.ny}x{grid.nz}")
    a, by = 2.504, 2.504 * np.sqrt(3.0)
    ncx, ncy = int(lx // a), int(lx // by)
    base = np.array([[0.0, 0.0, 1.696], [a / 2, by / 6, 1.696],
                     [a / 2, by / 2, 1.696], [0.0, by / 2 + by / 6, 1.696]])
    pos = np.concatenate([base + np.array([i * a, j * by, 0.0])
                          for i in range(ncx) for j in range(ncy)])[None]
    types = np.tile(np.array([5, 7, 5, 7], np.int32), ncx * ncy)
    plan = make_plan(grid.xs, grid.ys, grid.zs, pos, types)

    beams = build_beams(grid.xs, grid.ys, 30.0, 100e3, f=f)
    log(f"f={f}: {beams.n_beams} beams "
        f"(window {grid.nx // f}x{grid.ny // f})")

    t0 = time.perf_counter()
    sm = compute_smatrix(pos[0], plan, beams, xs=grid.xs, ys=grid.ys,
                         dz=grid.dz, precision="single", beam_chunk=32)
    sm.s.block_until_ready()
    t_build_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    sm = compute_smatrix(pos[0] * (1 + 1e-9), plan, beams, xs=grid.xs,
                         ys=grid.ys, dz=grid.dz, precision="single",
                         beam_chunk=32)
    sm.s.block_until_ready()
    t_build = time.perf_counter() - t0
    log(f"S-matrix build: {t_build:.3f} s/frame "
        f"(cold {t_build_cold:.1f} s incl compile)")

    lam = wavelength(100e3)
    mask = annular_mask(sm.kxs, sm.kys, lam, inner_mrad=45.0)
    for p_count in probe_counts:
        n = int(np.sqrt(p_count))
        scan = probe_grid([5, lx - 5], [5, lx - 5], n, p_count // n)
        vals = smatrix_reduce(sm, scan, mask, intensity=False,
                              precision="single", probe_chunk=16)   # compile
        t0 = time.perf_counter()
        vals = smatrix_reduce(sm, scan, mask, intensity=False,
                              precision="single", probe_chunk=16)
        t_red = time.perf_counter() - t0
        total = t_build + t_red
        # direct-path cost at the measured fused rate (BENCHMARKS.md)
        direct = len(scan) * grid.nz / 11200.0
        log(f"P={len(scan)}: reduce {t_red:.3f} s, total {total:.3f} s/frame"
            f" vs direct ~{direct:.3f} s -> {direct / total:.1f}x"
            f" (checksum {vals.sum():.4g})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-call HAADF scan benchmark: direct vs S-matrix (round-3 item 4).

Times ONE frame of frozen_phonon_haadf's inner loop (StreamingHAADF
add_frame) for a production-sized scan: n_probes positions on an hBN
sheet, direct path (probe-chunked propagation) vs the auto-dispatched
S-matrix path (PRISM factor f).

Usage: PYSLICE_SCAN_MODE=direct|smatrix python tools/bench_smatrix_scan.py \
           [n_probes] [f] [grid_n]
Run ONE mode per process on the axon relay.
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    from pyslice_tpu.core.grids import grid_from_box
    from pyslice_tpu.engine.pipeline import SimSpec
    from pyslice_tpu.engine.streaming import StreamingHAADF
    from pyslice_tpu.physics.potential import make_plan
    from pyslice_tpu.physics.probe import Probe, create_batched_probes, probe_grid

    n_probes = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    f = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    mode = os.environ.get("PYSLICE_SCAN_MODE", "smatrix")

    lx = n * 0.1
    grid = grid_from_box(lx, lx, 6.784, 0.1, 0.5, fast_grid=True)
    log(f"grid {grid.nx}x{grid.ny}x{grid.nz}, {n_probes} probes, mode={mode}")
    a, by = 2.504, 2.504 * np.sqrt(3.0)
    ncx, ncy = int(lx // a), int(lx // by)
    base = np.array([[0.0, 0.0, 1.696], [a / 2, by / 6, 1.696],
                     [a / 2, by / 2, 1.696], [0.0, by / 2 + by / 6, 1.696]])
    pos = np.concatenate([base + np.array([i * a, j * by, 0.0])
                          for i in range(ncx) for j in range(ncy)])
    types = np.tile(np.array([5, 7, 5, 7], np.int32), ncx * ncy)
    rng = np.random.default_rng(0)
    frame = pos + rng.random(pos.shape) * 0.05

    plan = make_plan(grid.xs, grid.ys, grid.zs, frame[None], types)
    spec = SimSpec.create(grid, plan, 100e3)
    side = int(round(np.sqrt(n_probes)))
    pg = probe_grid([lx * 0.1, lx * 0.9], [lx * 0.1, lx * 0.9], side, side)
    pg = pg[:n_probes]
    base_p = Probe(grid.xs, grid.ys, 30, 100e3)
    if mode == "direct":
        # probe construction itself must be chunked at this scale (one
        # vmapped build of 4096 probes is ~3x the batch in HBM), and the
        # assembly must donate (a concatenate holds source + result)
        import jax.numpy as jnp
        probes = jax.jit(lambda: jnp.zeros(
            (n_probes, grid.nx, grid.ny), jnp.complex64))()
        place = jax.jit(
            lambda b, c, i: jax.lax.dynamic_update_slice_in_dim(b, c, i, 0),
            donate_argnums=(0,), static_argnums=(2,))
        for i in range(0, n_probes, 256):
            probes = place(probes,
                           create_batched_probes(base_p,
                                                 pg[i:i + 256]).array, i)
    else:
        probes = None          # the S-matrix path synthesizes from
        #                        coefficients; no probe array at all

    synth_chunk = int(os.environ.get("PYSLICE_SYNTH_CHUNK", "1024"))

    def make():
        return StreamingHAADF(spec, probes, pg, collection_angle=45,
                              intensity=True, mrad=30.0,
                              use_smatrix=(mode == "smatrix"), prism_f=f,
                              probe_chunk=(256 if mode == "direct"
                                           else None),
                              synth_chunk=synth_chunk)

    st = make()
    log(f"use_smatrix={st.use_smatrix}"
        + (f" n_beams={st._beams.n_beams}" if st.use_smatrix else ""))

    t0 = time.time()
    st.add_frame(frame)
    img = st.image()          # forces completion through the host readback
    t_first = time.time() - t0
    t0 = time.time()
    st2 = make()
    st2.add_frame(frame)
    img = st2.image()
    t_warm = time.time() - t0
    log(f"{mode}: first {t_first:.1f}s, warm {t_warm:.2f}s/frame "
        f"({n_probes / t_warm:.0f} probes/s), img mean {img.mean():.4g}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Production-scale multislice-ptychography benchmark on the chip.

Simulates a 4D-STEM experiment (dense scan over a multi-slice specimen),
then reconstructs the depth-resolved potential with msp_reconstruct and
reports wall time per Adam step plus recovery quality.

Run: python scripts/bench_msp.py [--nx 256] [--scan 64] [--nz 6]
         [--steps 300] [--batch 256]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=256)
    ap.add_argument("--scan", type=int, default=64)
    ap.add_argument("--nz", type=int, default=6)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--mrad", type=float, default=25.0)
    args = ap.parse_args()

    import jax.numpy as jnp

    from pyslice_tpu.analysis.ptychography import msp_reconstruct
    from pyslice_tpu.core.constants import interaction_parameter, wavelength
    from pyslice_tpu.core.dtypes import get_precision
    from pyslice_tpu.physics.potential import make_plan, rasterize
    from pyslice_tpu.physics.probe import Probe, shift_probes
    from pyslice_tpu.physics.propagate import multislice
    from pyslice_tpu.utils.host import to_numpy

    prec = get_precision("single")
    nx = ny = args.nx
    nz = args.nz
    s = 0.15
    lx, ly = nx * s, ny * s
    xs = np.linspace(0, lx, nx, endpoint=False)
    ys = np.linspace(0, ly, ny, endpoint=False)
    zs = np.arange(nz) * 1.5

    rng = np.random.default_rng(0)
    n_atoms = int(0.06 * lx * ly * nz)          # ~amorphous density
    pos = rng.random((1, n_atoms, 3)) * np.array([lx, ly, zs[-1] + 1.4])
    types = rng.choice([5, 7, 14], n_atoms).astype(np.int32)
    plan = make_plan(xs, ys, zs, pos, types)
    v_true = rasterize(jnp.asarray(pos[0], prec.real), plan, prec)

    base = Probe(xs, ys, args.mrad, 100e3, precision=prec)
    n_s = args.scan
    positions = np.array([(i * lx / n_s, j * ly / n_s)
                          for i in range(n_s) for j in range(n_s)])
    print(f"simulating {n_s}x{n_s} = {len(positions)} patterns "
          f"({nx}^2 x {nz} slices, {n_atoms} atoms) ...")
    t0 = time.time()
    chunks = []
    for c0 in range(0, len(positions), 256):
        probes = shift_probes(base.array, base.kxs, base.kys,
                              positions[c0:c0 + 256], precision=prec)
        ew = multislice(probes, v_true, base.kxs, base.kys, eV=100e3,
                        dz=1.5, precision=prec)
        chunks.append(np.abs(to_numpy(
            jnp.fft.fftshift(jnp.fft.fft2(ew), axes=(-2, -1)))) ** 2)
    inten = np.concatenate(chunks)
    print(f"  data: {inten.nbytes / 1e9:.2f} GB in {time.time() - t0:.1f} s")

    t0 = time.time()
    rec = msp_reconstruct(inten, positions, base, n_slices=nz, dz=1.5,
                          steps=args.steps, batch=args.batch, lr=30.0)
    dt = time.time() - t0
    sigma = interaction_parameter(100e3)
    q = 2 * (args.mrad * 1e-3) / wavelength(100e3)
    mask = (np.fft.fftfreq(nx, s)[:, None] ** 2
            + np.fft.fftfreq(ny, s)[None, :] ** 2) < q ** 2

    def band(img):
        return np.real(np.fft.ifft2(np.fft.fft2(img) * mask))

    a = band(sigma * rec["potential"].sum(axis=0))
    b = band(sigma * np.asarray(v_true).sum(axis=0))
    a -= a.mean(); b -= b.mean()
    corr = float((a * b).sum() / np.sqrt((a**2).sum() * (b**2).sum()))
    print(f"MSP: {args.steps} steps x {args.batch} positions in {dt:.1f} s "
          f"({dt / args.steps * 1e3:.0f} ms/step, "
          f"{args.steps * args.batch / dt:.0f} position-updates/s)")
    print(f"loss {rec['losses'][0]:.3e} -> {rec['losses'][-1]:.3e}; "
          f"projected-potential corr r = {corr:.3f} in the probe band")


if __name__ == "__main__":
    main()

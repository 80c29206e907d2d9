#!/usr/bin/env python
"""Measure the reference implementation (h-walk/PySlice, PyTorch backend) on
this host to establish the baseline that bench.py's vs_baseline compares to.

The reference publishes no numbers (BASELINE.md), so the baseline is its
torch path executed here (CPU — no CUDA in this environment; BASELINE.json's
north star references the CUDA path, unavailable). Writes
baselines/reference_cpu.json.

Usage: python tools/bench_reference.py [--quick]
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")


def main():
    sys.path.insert(0, str(REF))
    import os
    os.chdir(REF)   # reference's kirkland.txt lookup is cwd-relative

    import numpy as np
    from src.multislice.multislice import Probe, Propagate, create_batched_probes
    from src.multislice.potentials import Potential

    quick = "--quick" in sys.argv
    lx = 102.35
    sampling = 0.1
    slice_thickness = 0.5
    nx = int(lx / sampling) + 1
    nz = int(6.784 / slice_thickness) + 1
    xs = np.linspace(0, lx, nx, endpoint=False)
    ys = np.linspace(0, lx, nx, endpoint=False)
    zs = np.linspace(0, 6.784, nz, endpoint=False)

    a, by = 2.504, 2.504 * np.sqrt(3.0)
    ncx, ncy = int(lx // a), int(lx // by)
    base = np.array([[0.0, 0.0, 1.696], [a / 2, by / 6, 1.696],
                     [a / 2, by / 2, 1.696], [0.0, by / 2 + by / 6, 1.696]])
    cells = [base + np.array([i * a, j * by, 0.0])
             for i in range(ncx) for j in range(ncy)]
    pos = np.concatenate(cells)
    rng = np.random.default_rng(0)
    pos = pos + rng.random(pos.shape) * 0.05
    types = ["B", "N", "B", "N"] * (ncx * ncy)

    n_probes = 4 if quick else 16
    print(f"reference bench: grid {nx}^2 x {nz}, atoms {len(pos)}, "
          f"probes {n_probes}", file=sys.stderr)

    t0 = time.perf_counter()
    potential = Potential(xs, ys, zs, pos, types, kind="kirkland")
    t_raster = time.perf_counter() - t0
    print(f"reference rasterize: {t_raster:.2f} s", file=sys.stderr)

    base_probe = Probe(xs, ys, 25, 100e3)
    pg = [(10.0 + 5 * i, 10.0 + 3 * i) for i in range(n_probes)]
    batched = create_batched_probes(base_probe, pg)

    t0 = time.perf_counter()
    out = Propagate(batched, potential)
    if hasattr(out, "cpu"):
        out = out.cpu().numpy()
    t_prop = time.perf_counter() - t0
    slice_steps = n_probes * nz
    steps_per_sec = slice_steps / t_prop
    print(f"reference propagate: {t_prop:.2f} s for {slice_steps} "
          f"slice-steps -> {steps_per_sec:.2f} steps/s", file=sys.stderr)

    # TACAW time-FFT shape (config 2): 100 frames x 1 probe x nx^2
    import torch
    wf = torch.rand(1, 100, nx, nx, dtype=torch.complex128)
    t0 = time.perf_counter()
    m = torch.mean(wf, dim=1, keepdim=True)
    f = torch.fft.fftshift(torch.fft.fft(wf - m, dim=1), dim=1)
    inten = torch.abs(f) ** 2
    t_tacaw = time.perf_counter() - t0
    print(f"reference TACAW FFT: {t_tacaw:.2f} s", file=sys.stderr)

    out_file = REPO / "baselines" / "reference_cpu.json"
    out_file.parent.mkdir(exist_ok=True)
    out_file.write_text(json.dumps({
        "source": "h-walk/PySlice torch backend on this host (CPU)",
        "grid": nx,
        "n_probes": n_probes,
        "nz": nz,
        "rasterize_s": round(t_raster, 3),
        "propagate_s": round(t_prop, 3),
        "slice_steps_per_sec": round(steps_per_sec, 3),
        "tacaw_fft_100f_s": round(t_tacaw, 3),
    }, indent=2))
    print(f"wrote {out_file}", file=sys.stderr)


if __name__ == "__main__":
    main()

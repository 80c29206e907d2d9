#!/usr/bin/env python
"""Gradient-step throughput: O(1)-memory adjoint vs naive scan autodiff.

Measures, on the session backend (real TPU under axon):

  1. forward-only multislice (fused kernel), as the speed-of-light anchor
  2. value_and_grad via physics.adjoint.multislice_diff (fused forward,
     reconstruction backward — O(1) residual memory)
  3. value_and_grad via plain jax autodiff over the XLA scan path
     (stores nz x n_probes x nx x ny complex residuals), where it fits

Loss: detector-weighted k-space intensity (a stand-in for a ptychography
data-fidelity term; plain total intensity has a zero gradient by
unitarity).

Run: python scripts/bench_adjoint.py [--nx 1024] [--probes 16] [--nz 100]
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
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--probes", type=int, default=16)
    ap.add_argument("--nz", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--skip-naive", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.physics.adjoint import multislice_diff
    from pyslice_tpu.physics.propagate import multislice
    from pyslice_tpu.utils.host import to_device_complex

    nx = ny = args.nx
    nb, nz = args.probes, args.nz
    rng = np.random.default_rng(0)
    psi = (rng.normal(size=(nb, nx, ny))
           + 1j * rng.normal(size=(nb, nx, ny))).astype(np.complex64)
    psi /= np.sqrt((np.abs(psi) ** 2).sum(axis=(1, 2), keepdims=True))
    v = (rng.normal(size=(nz, nx, ny)) * 30).astype(np.float32)
    kxs = np.fft.fftfreq(nx, d=0.1).astype(np.float32)
    kys = np.fft.fftfreq(ny, d=0.1).astype(np.float32)
    w = rng.random((nx, ny)).astype(np.float32)
    w_d = jnp.asarray(w)

    psi_d = to_device_complex(psi)
    v_d = jnp.asarray(v)

    # scalar readback forces completion (block_until_ready is not reliable
    # through the axon relay — same pattern as bench.py)
    noop = jax.jit(lambda x: jnp.sum(x))
    float(noop(v_d))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(v_d))
    t_overhead = (time.perf_counter() - t0) / 5

    R = args.reps

    def timed(fn, *a):
        """fn must run its work R times INSIDE jit (i-perturbed so no
        iteration is hoistable) and return a scalar — one readback, one
        measurement (the bench.py pattern; per-call loops mis-measure
        through the relay)."""
        float(fn(*a))                      # compile
        t0 = time.perf_counter()
        s = float(fn(*a))
        del s
        return max((time.perf_counter() - t0 - t_overhead) / R, 1e-9)

    steps = nb * nz

    @jax.jit
    def fwd(p, pot):
        def body(i, acc):
            out = multislice(p * (1.0 + 1e-12 * i), pot, kxs, kys,
                             eV=100e3, dz=0.5)
            return acc + jnp.sum(jnp.abs(out))
        return jax.lax.fori_loop(0, R, body, 0.0)

    t_f = timed(fwd, psi_d, v_d)
    print(f"forward (fused auto): {t_f * 1e3:8.2f} ms   "
          f"{steps / t_f:10.0f} slice-steps/s")

    def loss_adj(pot, p):
        out = multislice_diff(p, pot, kxs, kys, eV=100e3, dz=0.5)
        return jnp.mean(w_d * jnp.abs(jnp.fft.fft2(out)) ** 2)

    def scalarized(loss):
        vg = jax.value_and_grad(loss)

        @jax.jit
        def run(pot, p):
            def body(i, acc):
                val, g = vg(pot * (1.0 + 1e-12 * i), p)
                return acc + val + jnp.sum(jnp.abs(g))
            return jax.lax.fori_loop(0, R, body, 0.0)
        return run

    g_adj = scalarized(loss_adj)
    t_a = timed(g_adj, v_d, psi_d)
    print(f"grad (O(1) adjoint) : {t_a * 1e3:8.2f} ms   "
          f"{steps / t_a:10.0f} slice-steps/s   ({t_a / t_f:.2f}x forward)")

    if not args.skip_naive:
        naive_bytes = nz * nb * nx * ny * 8
        print(f"naive-autodiff residuals would be {naive_bytes / 1e9:.1f} GB")

        def loss_naive(pot, p):
            out = multislice(p, pot, kxs, kys, eV=100e3, dz=0.5, fused=False)
            return jnp.mean(w_d * jnp.abs(jnp.fft.fft2(out)) ** 2)

        g_nv = scalarized(loss_naive)
        try:
            t_n = timed(g_nv, v_d, psi_d)
            print(f"grad (naive, XLA)   : {t_n * 1e3:8.2f} ms   "
                  f"{steps / t_n:10.0f} slice-steps/s   "
                  f"(adjoint is {t_n / t_a:.2f}x faster)")
        except Exception as e:  # noqa: BLE001 — OOM is the expected mode
            print(f"grad (naive, XLA)   : FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark odd-grid (reference-natural) propagation paths on the TPU.

Reference grids are int(l/sampling)+1 — generically odd (1023, 1009, ...).
Compares the natural-order matmul-FFT loop against the digit-scrambled
formulation (ops.matfft.fft_scrambled: zero transposes in the slice loop).

Usage: python tools/bench_odd.py [n ...]   (default: 1023 1009 1024)
Env:   PYSLICE_BENCH_MODES=off,auto   (scrambled_fft modes to time)
       PYSLICE_SCRAMBLED_D=3          (force the small factor)
Run ONE config per process on the axon relay — mixing many distinct jit
programs in one process can poison subsequent executions (UNIMPLEMENTED).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.physics.propagate import multislice

    import os
    sizes = [int(a) for a in sys.argv[1:]] or [1023, 1009, 1024]
    n_probes = int(os.environ.get("PYSLICE_BENCH_PROBES", "16"))
    nz = 14
    dev = jax.devices()[0]
    log(f"device: {dev}")

    # readback overhead
    x0 = jnp.zeros((8, 8), jnp.float32)
    noop = jax.jit(lambda x: jnp.sum(x))
    float(noop(x0))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(x0))
    t_overhead = (time.perf_counter() - t0) / 5
    log(f"overhead {t_overhead*1e3:.1f} ms")

    R = 4
    for n in sizes:
        rng = np.random.default_rng(0)
        re = rng.standard_normal((n_probes, n, n)).astype(np.float32)
        im = rng.standard_normal((n_probes, n, n)).astype(np.float32)
        pot = rng.standard_normal((nz, n, n)).astype(np.float32)
        kxs = np.fft.fftfreq(n, d=0.1).astype(np.float32)
        kys = np.fft.fftfreq(n, d=0.1).astype(np.float32)
        red = jnp.asarray(re)
        imd = jnp.asarray(im)
        potd = jnp.asarray(pot)

        import os
        modes = os.environ.get("PYSLICE_BENCH_MODES", "off,auto").split(",")
        for mode in modes:
            ops_config.scrambled_fft = mode
            ops_config.fused_multislice = os.environ.get(
                "PYSLICE_BENCH_FUSED", "off")
            ops_config.resident_multislice = os.environ.get(
                "PYSLICE_BENCH_RESIDENT", "auto")

            @jax.jit
            def loop(r, i, v):
                psi0 = jax.lax.complex(r, i)

                def body(k, psi):
                    out = multislice(psi, v, kxs, kys, eV=100e3, dz=0.5,
                                     precision="single")
                    return out * (1.0 - 1e-12 * k)
                psi = jax.lax.fori_loop(0, R, body, psi0)
                return jnp.sum(jnp.abs(psi))

            t0 = time.perf_counter()
            s = float(loop(red, imd, potd))
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            s = float(loop(red, imd, potd))
            t = max(time.perf_counter() - t0 - t_overhead, 1e-9) / R
            steps = n_probes * nz / t
            log(f"n={n} scrambled={mode}: {t*1e3:.1f} ms/frame -> "
                f"{steps:.0f} slice-steps/s (first {t_first:.1f}s, "
                f"check {s:.5g})")


if __name__ == "__main__":
    main()

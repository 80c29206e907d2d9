#!/usr/bin/env python
"""Production-path benchmark: k-space exit waves on odd grids.

The TACAW production step is fftshift(fft2(multislice(psi))) (SURVEY §3.1,
calculators.py:285-287). On odd grids the round-2 best was the two-pass
chain + a separate XLA fft2/gather; the odd-resident kernel fuses the
conversion into its single dispatch. This times BOTH full conversions at
the reference's production shape (1 plane-wave probe, odd grid).

Usage: python tools/bench_odd_kspace.py [n] [n_probes] [nz]
Run ONE mode per process on the axon relay (PYSLICE_BENCH_RESIDENT=auto|off).
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
    import jax.numpy as jnp
    from pyslice_tpu.core.constants import interaction_parameter, wavelength
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.ops import matfft

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1023
    n_probes = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    nz = int(sys.argv[3]) if len(sys.argv) > 3 else 14
    mode = os.environ.get("PYSLICE_BENCH_RESIDENT", "auto")
    ops_config.resident_multislice = mode

    eV = 100e3
    lam = wavelength(eV)
    sig = interaction_parameter(eV)
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((n_probes, n, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((n_probes, n, n)).astype(np.float32))
    pot = jnp.asarray(rng.standard_normal((nz, n, n)).astype(np.float32))
    kxs = np.fft.fftfreq(n, d=0.1).astype(np.float32)

    dev = jax.devices()[0]
    log(f"device: {dev}  n={n} P={n_probes} nz={nz} resident={mode}")

    x0 = jnp.zeros((8, 8), jnp.float32)
    noop = jax.jit(lambda x: jnp.sum(x))
    float(noop(x0))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(x0))
    t_overhead = (time.perf_counter() - t0) / 5

    from pyslice_tpu.ops.fused_step_odd import fused_multislice_odd
    from pyslice_tpu.ops.fused_step_odd_resident import (
        fused_multislice_kspace_odd_resident, resident_odd_supported)

    R = 4

    if mode != "off" and resident_odd_supported(n, n, nz, n_probes):
        def one(psi):
            return fused_multislice_kspace_odd_resident(
                psi, pot, kxs, kxs, sigma=sig, lam=lam, dz=0.5)
        label = "odd-resident fused kspace"
    else:
        def one(psi):
            out = fused_multislice_odd(psi, pot, kxs, kxs, sigma=sig,
                                       lam=lam, dz=0.5)
            return jnp.fft.fftshift(matfft.fft2(out), axes=(-2, -1))
        label = "odd chain + XLA fft2"

    @jax.jit
    def loop(r, i):
        psi0 = jax.lax.complex(r, i)

        def body(k, acc):
            out = one(psi0 * (1.0 + 1e-12 * k))
            return acc + jnp.sum(jnp.abs(out))
        return jax.lax.fori_loop(0, R, body, jnp.float32(0))

    t0 = time.perf_counter()
    s = float(loop(re, im))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = float(loop(re, im))
    t = max(time.perf_counter() - t0 - t_overhead, 1e-9) / R
    steps = n_probes * nz / t
    log(f"{label}: {t*1e3:.1f} ms/frame-conversion -> {steps:.0f} "
        f"slice-steps/s (first {t_first:.1f}s, check {s:.6g})")


if __name__ == "__main__":
    main()

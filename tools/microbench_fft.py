#!/usr/bin/env python
"""Microbenchmark the building blocks of the odd-grid transform on TPU.

All device constants are created UP FRONT: on the axon relay, host->device
transfers issued after timed jitted loops intermittently fail with
UNIMPLEMENTED, while transfers before any compute are reliable.
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
    from pyslice_tpu.ops import matfft

    R, n = 16, 1023
    rng = np.random.default_rng(0)

    # --- ALL transfers first -------------------------------------------------
    re = jnp.asarray(rng.standard_normal((R, n, n)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((R, n, n)).astype(np.float32))
    ws = {}
    for d in (3, 11, 33):
        n2 = n // d
        w = jnp.asarray((rng.standard_normal((n2, n2)) / n2).astype(np.float32))
        ws[d] = jax.jit(lambda w=w: jax.lax.complex(w, w * 0.5))()
    wfull = jnp.asarray((rng.standard_normal((n, n)) / n).astype(np.float32))
    wfullc = jax.jit(lambda: jax.lax.complex(wfull, wfull * 0.5))()
    jax.block_until_ready([re, im, list(ws.values()), wfullc])

    noop = jax.jit(lambda x: jnp.sum(x))
    float(noop(re))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(re))
    ovh = (time.perf_counter() - t0) / 5
    log(f"overhead {ovh*1e3:.1f} ms")

    LOOPS = 8

    def timed(name, fn):
        @jax.jit
        def loop(r, i):
            x = jax.lax.complex(r, i)

            def body(k, c):
                return fn(c) * (1.0 - 1e-12 * k)
            out = jax.lax.fori_loop(0, LOOPS, body, x)
            return jnp.sum(jnp.abs(out))
        try:
            t0 = time.perf_counter()
            float(loop(re, im))
            tc = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(loop(re, im))
            t = max(time.perf_counter() - t0 - ovh, 1e-9) / LOOPS
            log(f"{name}: {t*1e3:.2f} ms (compile {tc:.1f}s)")
        except Exception as e:
            log(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")

    timed("elementwise multiply", lambda x: x * 1.0001)

    for d in (3, 11, 33):
        n2 = n // d
        wc = ws[d]

        def mm(x, d=d, n2=n2, wc=wc):
            v = x.reshape(R, n, d, n2)
            z = jnp.einsum("...b,bc->...c", v, wc,
                           preferred_element_type=x.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            return z.reshape(R, n, n)
        timed(f"last-dim matmul K={n2} HIGHEST", mm)

    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        p = getattr(jax.lax.Precision, prec)

        def mmf(x, p=p):
            return jnp.einsum("...b,bc->...c", x, wfullc,
                              preferred_element_type=x.dtype, precision=p)
        timed(f"full {n}x{n} matmul {prec}", mmf)

    def stk(x):
        v = x.reshape(R, n, 11, 93)
        ys = [v[..., a, :] * (1.0 + 0.01 * a) for a in range(11)]
        return jnp.stack(ys, axis=-2).reshape(R, n, n)
    timed("11-slice FMA + stack", stk)

    timed("fft_scrambled(-1)", lambda x: matfft.fft_scrambled(x, -1))
    timed("fft_scrambled(-2)", lambda x: matfft.fft_scrambled(x, -2))
    timed("fft_matmul(-1) natural", lambda x: matfft.fft_matmul(x, -1))
    timed("fft_matmul(-2) natural", lambda x: matfft.fft_matmul(x, -2))
    timed("jnp.fft.fft(-1)", lambda x: jnp.fft.fft(x, axis=-1))
    timed("jnp.fft.fft2", lambda x: jnp.fft.fft2(x))


if __name__ == "__main__":
    main()

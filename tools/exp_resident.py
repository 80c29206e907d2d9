#!/usr/bin/env python
"""One-off experiment: where does the resident kernel's per-transform time
go vs the two-pass chain? Times stripped-down kernel variants at 1024^2.
(The SHIPPED kernels are timed with tools/bench_odd.py via
PYSLICE_BENCH_RESIDENT=auto|off; this script only isolates whether the
resident kernel's conditionals cost anything — they don't: both stripped
variants measured ~23 ms vs the real kernel's 24.7 at 16 probes.)

Variants:
  uncond   — resident grid (P, nz) but the body is ONLY stage_b + stage_a
             with no s-conditionals (math wrong at boundaries; timing only).
  nofirst  — like the real kernel but without the s==0 branch code.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from pyslice_tpu.ops.fused_step import (
        _block_rows, _cmul, _fft_minor_perm, _ifft_minor_perm,
        _make_const_inputs)
    from pyslice_tpu.ops import fused_step_resident as fsr

    P, N, NZ = 16, 1024, 14
    nx = ny = N
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((P, N, N)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((P, N, N)).astype(np.float32))
    vs = jnp.asarray(rng.standard_normal((NZ, N, N)).astype(np.float32))
    pr = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))
    pi = jnp.asarray(rng.standard_normal((N, N)).astype(np.float32))

    static, consts = _make_const_inputs(N)
    bx = _block_rows(nx, ny)
    by = _block_rows(ny, nx)
    n_c = len(consts)

    def transmit(r, i, phase):
        return _cmul(r, i, jnp.cos(phase), jnp.sin(phase))

    def make_body(variant):
        def body(vr_ref, vi_ref, v_ref, pr_ref, pi_ref, *rest):
            c_refs = rest[:n_c]
            (or_ref, oi_ref, str_ref, sti_ref,
             tmr_ref, tmi_ref) = rest[n_c:]
            planes = [r[:] for r in c_refs]
            s = pl.program_id(1)

            def stage_b():
                for j in range(ny // by):
                    c = slice(j * by, (j + 1) * by)
                    r2, i2 = _fft_minor_perm(str_ref[:, c], sti_ref[:, c],
                                             static, planes, tin=True)
                    r2, i2 = _cmul(r2, i2, pr_ref[c, :], pi_ref[c, :])
                    r2, i2 = _ifft_minor_perm(r2, i2, static, planes)
                    tmr_ref[c, :] = r2
                    tmi_ref[c, :] = i2

            def stage_a(store_out=False):
                for i in range(nx // bx):
                    r = slice(i * bx, (i + 1) * bx)
                    r2, i2 = _ifft_minor_perm(tmr_ref[:, r], tmi_ref[:, r],
                                              static, planes, tin=True)
                    r2, i2 = transmit(r2, i2, v_ref[0, r, :])
                    fr, fi = _fft_minor_perm(r2, i2, static, planes)
                    str_ref[r, :] = fr
                    sti_ref[r, :] = fi
                    if store_out:
                        or_ref[0, r, :] = r2
                        oi_ref[0, r, :] = i2

            if variant == "uncond":
                @pl.when(s == 0)
                def _():
                    str_ref[:] = vr_ref[0]
                    sti_ref[:] = vi_ref[0]
                stage_b()
                stage_a(store_out=False)
                @pl.when(s == NZ - 1)
                def _():
                    or_ref[0] = str_ref[:]
                    oi_ref[0] = sti_ref[:]
            elif variant == "nofirst":
                @pl.when(s == 0)
                def _():
                    str_ref[:] = vr_ref[0]
                    sti_ref[:] = vi_ref[0]
                @pl.when(s > 0)
                def _():
                    stage_b()
                    stage_a(store_out=False)
                @pl.when(s == NZ - 1)
                def _():
                    or_ref[0] = str_ref[:]
                    oi_ref[0] = sti_ref[:]
        return body

    def run_variant(variant):
        single = pl.Buffered(buffer_count=1)
        psi_spec = pl.BlockSpec((1, nx, ny), lambda p, s: (p, 0, 0),
                                memory_space=pltpu.VMEM, pipeline_mode=single)
        v_spec = pl.BlockSpec((1, nx, ny), lambda p, s: (s, 0, 0),
                              memory_space=pltpu.VMEM)
        p_spec = pl.BlockSpec((ny, nx), lambda p, s: (0, 0),
                              memory_space=pltpu.VMEM, pipeline_mode=single)
        c_spec = [pl.BlockSpec(a.shape, lambda p, s: (0, 0),
                               memory_space=pltpu.VMEM, pipeline_mode=single)
                  for a in consts]
        out_spec = pl.BlockSpec((1, nx, ny), lambda p, s: (p, 0, 0),
                                memory_space=pltpu.VMEM)

        def call(re, im):
            return pl.pallas_call(
                make_body(variant),
                grid=(P, NZ),
                in_specs=[psi_spec, psi_spec, v_spec, p_spec, p_spec] + c_spec,
                out_specs=[out_spec, out_spec],
                out_shape=[jax.ShapeDtypeStruct((P, nx, ny), jnp.float32)] * 2,
                scratch_shapes=[pltpu.VMEM((nx, ny), jnp.float32)] * 2
                               + [pltpu.VMEM((ny, nx), jnp.float32)] * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )(re, im, vs, pr, pi, *consts)

        R = 4

        @jax.jit
        def f(re, im, vs, pr, pi):
            def bodyk(k, c):
                r, i = call(c[0] * (1.0 - 1e-12 * k), c[1])
                return (r, i)
            r, i = jax.lax.fori_loop(0, R, bodyk, (re, im))
            return jnp.sum(jnp.abs(r)) + jnp.sum(jnp.abs(i))

        t0 = time.perf_counter()
        s0 = float(f(re, im, vs, pr, pi))
        t_first = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(re, im, vs, pr, pi))
            ts.append(time.perf_counter() - t0)
        t = (min(ts) - 0.030) / R
        log(f"{variant}: {t*1e3:.1f} ms (first {t_first:.1f}s, check {s0:.4g})"
            f" -> {P*NZ/t:.0f} steps/s")

    for v in sys.argv[1:] or ["uncond", "nofirst"]:
        if v not in ("uncond", "nofirst"):
            raise SystemExit(f"unknown variant {v!r} (use uncond/nofirst; "
                             "shipped kernels: tools/bench_odd.py)")
        run_variant(v)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the primary metric.

Primary metric (BASELINE.json): probe-frame slice-steps/sec/chip at 1024^2.
One slice-step = one multislice step (phase-grating multiply + Fresnel
FFT/IFFT pair) of a single probe's 1024^2 complex64 wavefunction. A frame
with P probes and nz slices contributes P*nz slice-steps.

Timing methodology: the axon relay's block_until_ready does not synchronize,
so every measurement is a jitted R-times fori_loop over the kernel whose
result collapses to a scalar readback; the loop carry depends on the
iteration counter so XLA cannot hoist the body. Per-iteration time =
(t_total - t_readback_overhead) / R.

``vs_baseline`` compares against the reference implementation measured on
this host (tools/bench_reference.py -> baselines/reference_cpu.json; the
reference publishes no numbers — BASELINE.md).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# Stage-by-stage partial results. The measuring child appends each stage's
# numbers here and checkpoints them to PYSLICE_BENCH_PARTIAL so the
# watchdog parent can still emit a (marked) JSON line if a later stage
# hangs the process — the remote-device relay here can wedge inside an
# uninterruptible C call, which no in-process guard can catch.
_partial = {}


def _checkpoint(**kw):
    _partial.update(kw)
    path = os.environ.get("PYSLICE_BENCH_PARTIAL")
    if path:
        try:
            Path(path).write_text(json.dumps(_partial))
        except OSError:
            pass


def _emit_line(partial, error=None):
    steps = partial.get("steps_per_sec")
    vs = partial.get("vs_baseline")
    detail = {k: v for k, v in partial.items()
              if k not in ("steps_per_sec", "vs_baseline")}
    if error:
        detail["error"] = error
    print(json.dumps({
        "metric": "probe_frame_slice_steps_per_sec_per_chip_1024",
        "value": round(steps, 2) if steps else None,
        "unit": "slice-steps/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        "detail": detail,
    }), flush=True)


def _watchdog_main():
    """Run the measurement in a child process under a hard deadline
    (PYSLICE_BENCH_DEADLINE_S, default 3600 s). On child hang or crash,
    emit the JSON line from the child's checkpointed partial results with
    an ``error`` field instead of producing no artifact at all."""
    import subprocess
    import tempfile
    deadline = float(os.environ.get("PYSLICE_BENCH_DEADLINE_S", "3600"))
    with tempfile.NamedTemporaryFile(mode="w", suffix=".json",
                                     delete=False) as f:
        partial_path = f.name
    env = dict(os.environ, PYSLICE_BENCH_CHILD="1",
               PYSLICE_BENCH_PARTIAL=partial_path)
    child = subprocess.Popen([sys.executable, __file__] + sys.argv[1:],
                             env=env)
    try:
        rc = child.wait(timeout=deadline)
    except subprocess.TimeoutExpired:
        child.kill()
        child.wait()
        rc = "deadline"
    if rc == 0:
        os.unlink(partial_path)
        return
    try:
        partial = json.loads(Path(partial_path).read_text() or "{}")
    except (OSError, ValueError):
        partial = {}
    os.unlink(partial_path)
    err = ("deadline exceeded after "
           f"{deadline:.0f}s (device relay hang?)" if rc == "deadline"
           else f"bench child exited {rc}")
    log(f"bench watchdog: {err}; emitting partial results")
    _emit_line(partial, error=err)


def build_problem(n_probes=16, lx=102.35, sampling=0.1, slice_thickness=0.5,
                  n_frames=1, seed=0):
    from pyslice_tpu.core.grids import grid_from_box
    from pyslice_tpu.engine.pipeline import SimSpec
    from pyslice_tpu.physics.potential import make_plan
    from pyslice_tpu.physics.probe import Probe, create_batched_probes, probe_grid

    grid = grid_from_box(lx, lx, 6.784, sampling, slice_thickness)

    # Fill the box with an hBN monolayer (≈4 atoms per 2.504 x 4.337 A cell).
    a = 2.504
    by = np.sqrt(3.0) * a
    ncx, ncy = int(lx // a), int(lx // by)
    base = np.array([[0.0, 0.0, 1.696], [a / 2, by / 6, 1.696],
                     [a / 2, by / 2, 1.696], [0.0, by / 2 + by / 6, 1.696]])
    cells = [base + np.array([i * a, j * by, 0.0])
             for i in range(ncx) for j in range(ncy)]
    pos0 = np.concatenate(cells)
    types = np.tile(np.array([5, 7, 5, 7], dtype=np.int32), ncx * ncy)
    rng = np.random.default_rng(seed)
    positions = pos0[None] + rng.random((n_frames, len(pos0), 3)) * 0.05

    plan = make_plan(grid.xs, grid.ys, grid.zs, positions, types)
    spec = SimSpec.create(grid, plan, 100e3)
    basep = Probe(grid.xs, grid.ys, 25, 100e3)
    pg = probe_grid([10, 90], [10, 90], max(1, n_probes // 4), 4)[:n_probes] \
        if n_probes > 1 else [(lx / 2, lx / 2)]
    probes = create_batched_probes(basep, pg).array
    return grid, spec, positions, probes, types


def main():
    import jax
    # Debug escape hatch (the env JAX_PLATFORMS route is preempted by this
    # environment's sitecustomize importing jax first).
    plat = os.environ.get("PYSLICE_BENCH_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from pyslice_tpu.physics.potential import rasterize
    from pyslice_tpu.physics.propagate import multislice

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")
    _checkpoint(device=str(dev))

    n_probes = 16
    grid, spec, positions, probes, types = build_problem(n_probes=n_probes)
    nz = grid.nz
    log(f"grid {grid.nx}x{grid.ny}x{nz}, atoms {positions.shape[1]}, "
        f"probes {n_probes}")

    pos0 = jnp.asarray(positions[0], dtype=jnp.float32)
    kxs = jnp.asarray(spec.plan.kxs, dtype=jnp.float32)
    kys = jnp.asarray(spec.plan.kys, dtype=jnp.float32)

    # --- readback overhead -------------------------------------------------
    noop = jax.jit(lambda x: jnp.sum(x))
    _ = float(noop(pos0))
    t0 = time.perf_counter()
    for _ in range(5):
        float(noop(pos0))
    t_overhead = (time.perf_counter() - t0) / 5
    log(f"dispatch+readback overhead: {t_overhead * 1e3:.1f} ms")

    def timed_loop(jitted, args, R, label):
        """Compile, then time the R-iteration jitted loop with one scalar
        readback; returns seconds per iteration. Operands are passed as
        arguments (never closures — jit would constant-fold device arrays
        through a host transfer, which complex buffers cannot do here)."""
        t0 = time.perf_counter()
        float(jitted(*args))               # compile + first run
        t_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = float(jitted(*args))
        t = time.perf_counter() - t0
        per = max(t - t_overhead, 1e-9) / R
        log(f"{label}: {per * 1e3:.2f} ms/iter "
            f"(first call {t_first:.1f} s incl compile; check {s:.4g})")
        return per

    # --- propagation (the headline kernel) ---------------------------------
    R_PROP = 8

    @jax.jit
    def prop_loop(psi0, v):
        def body(i, psi):
            out = multislice(psi, v, kxs, kys, eV=spec.eV,
                             lam=spec.lam, dz=spec.dz,
                             precision=spec.precision)
            # rescale so the carry neither diverges nor is hoistable
            return out * (1.0 - 1e-12 * i)
        psi = jax.lax.fori_loop(0, R_PROP, body, psi0)
        return jnp.sum(jnp.abs(psi))

    v_global = rasterize(pos0, spec.plan, spec.precision)
    t_prop = timed_loop(prop_loop, (probes, v_global), R_PROP,
                        f"propagate/frame ({n_probes}p x {nz}sl)")
    slice_steps = n_probes * nz
    steps_per_sec = slice_steps / t_prop
    _checkpoint(steps_per_sec=steps_per_sec,
                propagate_frame_ms=round(t_prop * 1e3, 2))

    # --- potential rasterization -------------------------------------------
    R_RAST = 4

    @jax.jit
    def raster_loop(pos):
        def body(i, acc):
            v = rasterize(pos + (1e-9 * i), spec.plan, spec.precision)
            return acc + jnp.sum(jnp.abs(v))
        return jax.lax.fori_loop(0, R_RAST, body, jnp.float32(0.0))

    t_raster = timed_loop(raster_loop, (pos0,), R_RAST, "rasterize/frame")
    _checkpoint(rasterize_frame_ms=round(t_raster * 1e3, 2))

    # --- TACAW time-FFT (config 2 shape: 100 frames, 1 probe, 1024^2) ------
    R_FFT = 3

    @jax.jit
    def tacaw_loop(re, im):
        def body(i, acc):
            x = jax.lax.complex(re + 1e-9 * i, im)
            x = x - jnp.mean(x, axis=1, keepdims=True)
            f = jnp.fft.fftshift(jnp.fft.fft(x, axis=1), axes=1)
            return acc + jnp.sum(jnp.abs(f) ** 2)
        return jax.lax.fori_loop(0, R_FFT, body, jnp.float32(0.0))

    ramp = np.linspace(0, 1, 100, dtype=np.float32)[None, :, None, None]
    re0 = jnp.asarray(np.broadcast_to(0.5 * ramp,
                                      (1, 100, grid.nx, grid.ny)).copy())
    im0 = jnp.full((1, 100, grid.nx, grid.ny), 0.25, jnp.float32)
    t_tacaw = timed_loop(tacaw_loop, (re0, im0), R_FFT,
                         "TACAW time-FFT (100f x 1024^2)")
    _checkpoint(tacaw_fft_100f_ms=round(t_tacaw * 1e3, 2))

    # --- odd (reference-natural) grid, multi-probe STEM shape ---------------
    # 1023^2 x 16 probes: the digit-split chain with the round-4 cost-model
    # split (d=11/m=93). Guarded: a failure here must not cost the primary
    # metric.
    odd_steps_per_sec = None
    try:
        grid_o, spec_o, positions_o, probes_o, _ = build_problem(
            n_probes=n_probes, lx=102.25)
        assert grid_o.nx == 1023, grid_o.nx
        kxs_o = jnp.asarray(spec_o.plan.kxs, dtype=jnp.float32)
        kys_o = jnp.asarray(spec_o.plan.kys, dtype=jnp.float32)
        pos_o = jnp.asarray(positions_o[0], dtype=jnp.float32)

        @jax.jit
        def prop_loop_odd(psi0, v):
            def body(i, psi):
                out = multislice(psi, v, kxs_o, kys_o, eV=spec_o.eV,
                                 lam=spec_o.lam, dz=spec_o.dz,
                                 precision=spec_o.precision)
                return out * (1.0 - 1e-12 * i)
            psi = jax.lax.fori_loop(0, R_PROP, body, psi0)
            return jnp.sum(jnp.abs(psi))

        v_odd = rasterize(pos_o, spec_o.plan, spec_o.precision)
        t_odd = timed_loop(prop_loop_odd, (probes_o, v_odd), R_PROP,
                           f"propagate/frame odd 1023^2 ({n_probes}p x "
                           f"{grid_o.nz}sl)")
        odd_steps_per_sec = n_probes * grid_o.nz / t_odd
        _checkpoint(odd_1023_16p_steps_per_s=round(odd_steps_per_sec, 1))
    except Exception as e:          # pragma: no cover - defensive
        log(f"odd-grid bench skipped: {e}")

    # --- end-to-end numbers (round-5 verdict item 2) -------------------------
    # Two BASELINE.md configs measured through the PUBLIC facade every
    # round so e2e regressions (like round 4's config-5 drift) surface in
    # BENCH_r*.json automatically, not only in the hand-run BENCHMARKS.md
    # table. Guarded: a failure here must not cost the primary metric.
    e2e_c2 = e2e_c5 = None
    try:
        from tools.bench_configs import _config2, _config5
        e2e_c2 = _config2(quick=True)    # 1024^2, device-resident TACAW
        log(f"e2e config2: {e2e_c2}")
        _checkpoint(e2e_config2_per_frame_ms=e2e_c2["per_frame_ms"],
                    e2e_config2_extrapolated_100f_s=(
                        e2e_c2["extrapolated_100f_s"]))
        e2e_c5 = _config5(quick=True)    # 2048^2 x 64p streaming TACAW
        log(f"e2e config5: {e2e_c5}")
        _checkpoint(e2e_config5_per_frame_s=e2e_c5["per_frame_s"])
    except Exception as e:              # pragma: no cover - defensive
        log(f"e2e config bench skipped: {e}")

    # --- baseline comparison ------------------------------------------------
    vs_baseline = None
    ref_file = Path(__file__).parent / "baselines" / "reference_cpu.json"
    if ref_file.exists():
        ref = json.loads(ref_file.read_text())
        ref_steps = ref.get("slice_steps_per_sec")
        if ref_steps:
            vs_baseline = steps_per_sec / ref_steps
            _checkpoint(vs_baseline=vs_baseline)
        if ref.get("tacaw_fft_100f_s"):
            _checkpoint(tacaw_fft_vs_ref_cpu=round(
                ref["tacaw_fft_100f_s"] / t_tacaw, 1))

    _emit_line(_partial)


if __name__ == "__main__":
    if os.environ.get("PYSLICE_BENCH_CHILD") == "1":
        main()
    else:
        _watchdog_main()

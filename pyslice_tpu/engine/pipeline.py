"""Functional simulation pipeline (device-resident fast path).

One frame of the TACAW production path (SURVEY §3.1): rasterize the frame's
projected potential, propagate the probe batch through it, convert exit waves
to k-space with fftshift(fft2(.)). Everything is jit-compiled with static
shapes; frames are mapped with lax.map (single device) or sharded over the
'frame' mesh axis (see parallel.sharded).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import wavelength as _wavelength
from ..core.dtypes import Precision, get_precision
from ..core.grids import Grid
from ..ops import matfft
from ..physics.potential import RasterizerPlan, rasterize
from ..physics.propagate import multislice


@dataclasses.dataclass(frozen=True, eq=False)
class SimSpec:
    """Static simulation description (jit static argument; identity-hashed).

    Bundles the grid, rasterization plan, and beam parameters for one
    simulation config.
    """
    grid: Grid
    plan: RasterizerPlan
    eV: float
    lam: float
    dz: float
    record_layers: Optional[Tuple[int, ...]]  # None -> exit wave only
    precision: Precision
    ksq2d: Optional[np.ndarray] = None   # oblique |k|^2 grid (fftfreq order)
    kmax2: Optional[float] = None        # antialiasing band limit, 1/A^2
    tantilt: Optional[Tuple[float, float]] = None  # beam tilt tangents

    @classmethod
    def create(cls, grid: Grid, plan: RasterizerPlan, eV: float,
               record_layers=None, precision=None,
               bandwidth_limit: Optional[float] = None,
               tilt: Optional[Tuple[float, float]] = None) -> "SimSpec":
        """``bandwidth_limit``: optional antialiasing band limit as a
        fraction of the tightest-axis Nyquist (2/3 is the standard
        choice); folded into every kernel's Fresnel multiplier at zero
        per-step cost. None (default) = reference parity (no limit).

        ``tilt``: optional (theta_x, theta_y) beam tilt in mrad —
        tilted-propagator multislice (physics.propagate.tilt_tangents);
        orthogonal cells only. Also free per step (same planes)."""
        from ..physics.propagate import bandwidth_kmax2, tilt_tangents
        prec = get_precision(precision)
        rl = tuple(int(x) for x in record_layers) if record_layers is not None else None
        ksq2d = grid.ksq2d() if getattr(grid, "is_oblique", False) else None
        tantilt = tilt_tangents(tilt)
        if tantilt is not None and ksq2d is not None:
            raise ValueError("beam tilt needs an orthogonal cell")
        return cls(grid=grid, plan=plan, eV=float(eV), lam=_wavelength(eV),
                   dz=grid.dz, record_layers=rl, precision=prec,
                   ksq2d=ksq2d,
                   kmax2=bandwidth_kmax2(grid.kxs(), grid.kys(),
                                         bandwidth_limit, ksq2d),
                   tantilt=tantilt)


def _plan_buckets(plan: RasterizerPlan):
    """The plan's bucket lists, passed as TRACED inputs at the jit
    boundaries below so the compiled program — and its persistent-compile-
    cache key — depends only on the plan's quantized shapes, not on which
    (type, slice) bins this particular trajectory's thermal noise
    populated. A re-run on fresh MD data of the same system then reloads
    the cached executable in seconds instead of recompiling for ~a minute
    through the relay.

    Returned as host NumPy arrays deliberately: they are a few dozen ints
    (transfer cost is nil), and materializing device copies here would
    create tracers when a caller sits inside an outer trace (jnp.asarray
    stages even concrete constants) — cached tracers then leak across
    traces."""
    return plan.bucket_types, plan.bucket_slices


def frame_exit_waves(positions, probes, spec: SimSpec) -> jnp.ndarray:
    """k-space exit waves for one MD frame.

    Args:
        positions: (n_atoms, 3) frame positions.
        probes: (n_probes, nx, ny) complex probe batch.
        spec: static SimSpec.

    Returns:
        (n_probes, nx, ny, n_layers) complex, fftshifted k-space
        (calculators.py:285-287 semantics). n_layers == 1 when
        spec.record_layers is None.

    Called at the top level, this compiles a program whose cache key is
    trajectory-independent (see _plan_buckets). Called inside an outer
    trace (streaming/sharded engines), the bucket lists become constants
    of THAT program — numerics identical either way.
    """
    bt, bs = _plan_buckets(spec.plan)
    return _frame_exit_waves(positions, probes, bt, bs, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _frame_exit_waves(positions, probes, bucket_types, bucket_slices,
                      spec: SimSpec) -> jnp.ndarray:
    from ..physics.potential import rasterize_traced_buckets
    v = rasterize_traced_buckets(positions, bucket_types, bucket_slices,
                                 spec.plan, spec.precision)
    return exit_waves_from_potential(v, probes, spec)


def exit_waves_from_potential(v, probes, spec: SimSpec) -> jnp.ndarray:
    """frame_exit_waves given an already-rasterized potential stack ``v``
    (nz, nx, ny). Probe-chunked callers (engine.streaming) rasterize a
    frame ONCE and run every chunk through this — the rasterizer is the
    per-frame cost that must not repeat per chunk. Trace-level function
    (callers sit inside their own jit)."""
    from ..physics.propagate import (_fused_eligible, _resident_eligible,
                                     _resident_odd_eligible)
    from ..ops import config as ops_config
    kspace_fn = None
    if spec.record_layers is None and ops_config.fused_multislice != "off":
        # Fully fused path: the exit fftshift(fft2(.)) folds into the kernel
        # chain/dispatch (ops.fused_step.fused_multislice_kspace, the
        # VMEM-resident variant when the grid fits its budget, or the odd
        # resident variant for reference-natural int(l/s)+1 grids) — saves
        # the standalone conversion's HBM passes.
        if _fused_eligible(probes.shape, spec.record_layers,
                           spec.precision):
            if _resident_eligible(probes.shape, v.shape[0], spec.precision):
                from ..ops.fused_step_resident import (
                    fused_multislice_kspace_resident as kspace_fn)
            else:
                from ..ops.fused_step import (
                    fused_multislice_kspace as kspace_fn)
        elif _resident_odd_eligible(probes.shape, v.shape[0],
                                    spec.precision):
            from ..ops.fused_step_odd_resident import (
                fused_multislice_kspace_odd_resident as kspace_fn)
    if kspace_fn is not None:
        from ..core.constants import interaction_parameter
        k = kspace_fn(
            jnp.asarray(probes, dtype=spec.precision.complex), v,
            spec.plan.kxs, spec.plan.kys,
            sigma=interaction_parameter(spec.eV), lam=spec.lam, dz=spec.dz,
            ksq=spec.ksq2d, kmax2=spec.kmax2, tantilt=spec.tantilt)
        return k[..., None]                   # (probes, nx, ny, 1)

    psi = multislice(probes, v, spec.plan.kxs, spec.plan.kys, eV=spec.eV,
                     lam=spec.lam, dz=spec.dz,
                     record_layers=spec.record_layers,
                     precision=spec.precision, ksq=spec.ksq2d,
                     kmax2=spec.kmax2, tantilt=spec.tantilt)
    if spec.record_layers is None:
        psi = psi[None]                       # (1, n_probes, nx, ny)
    k = jnp.fft.fftshift(matfft.fft2(psi), axes=(-2, -1))
    return jnp.transpose(k, (1, 2, 3, 0))     # (probes, nx, ny, layers)


def simulate_frames(positions_frames, probes, spec: SimSpec) -> jnp.ndarray:
    """Map frame_exit_waves over a stacked (n_frames, n_atoms, 3) block.

    Returns (n_probes, n_frames, nx, ny, n_layers) — WFData layout. Frames are
    processed sequentially on-device (lax.map); use parallel.sharded to spread
    frames/probes over a mesh. Bucket lists ride as traced inputs (see
    _plan_buckets) so the block program's cache key is
    trajectory-independent.
    """
    bt, bs = _plan_buckets(spec.plan)
    return _simulate_frames(positions_frames, probes, bt, bs, spec)


@functools.partial(jax.jit, static_argnames=("spec",))
def _simulate_frames(positions_frames, probes, bucket_types, bucket_slices,
                     spec: SimSpec) -> jnp.ndarray:
    out = jax.lax.map(
        lambda p: _frame_exit_waves(p, probes, bucket_types, bucket_slices,
                                    spec),
        positions_frames)                     # (frames, probes, nx, ny, layers)
    return jnp.transpose(out, (1, 0, 2, 3, 4))


def simulate_frames_into(out, i0, positions_frames, probes,
                         spec: SimSpec) -> jnp.ndarray:
    """simulate_frames + in-place placement at frame offset ``i0`` of the
    donated accumulator ``out`` (probes, n_frames, nx, ny, layers) — ONE
    device dispatch per block instead of compute-then-place (each relayed
    dispatch costs ~25-50 ms wall-clock). ``i0`` is traced, so every block
    offset reuses the same compiled program."""
    bt, bs = _plan_buckets(spec.plan)
    return _simulate_frames_into(out, jnp.asarray(i0, jnp.int32),
                                 positions_frames, probes, bt, bs, spec)


@functools.partial(jax.jit, static_argnames=("spec",), donate_argnums=(0,))
def _simulate_frames_into(out, i0, positions_frames, probes,
                          bucket_types, bucket_slices,
                          spec: SimSpec) -> jnp.ndarray:
    fk = jax.lax.map(
        lambda p: _frame_exit_waves(p, probes, bucket_types, bucket_slices,
                                    spec),
        positions_frames)
    fk = jnp.transpose(fk, (1, 0, 2, 3, 4)).astype(out.dtype)
    return jax.lax.dynamic_update_slice_in_dim(out, fk, i0, axis=1)

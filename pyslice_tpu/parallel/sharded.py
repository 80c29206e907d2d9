"""Sharded execution of the TACAW pipeline over a (frame, probe) mesh.

Propagation is embarrassingly parallel over (frame, probe): each device runs
the full multislice loop for its local frames x probes with zero
communication (the reference's serial frame loop, calculators.py:172,
becomes the mesh's frame axis). The cross-frame dependency appears only at
the TACAW time-FFT (SURVEY §3.3): every (probe, kx, ky) pixel needs all
frames. ``tacaw_intensity_sharded`` performs the layout change as an
``all_to_all`` over ICI — frame shards are exchanged for kx shards — then
FFTs locally along the now-complete time axis. Reductions (spectrum /
diffraction averaging) finish with ``psum`` over the relevant axes.

All functions here are shard_map'ed over an explicit Mesh; single-device
paths (engine.pipeline) stay unsharded and identical in math.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..engine.pipeline import SimSpec, frame_exit_waves
from ..ops import matfft
from .mesh import FRAME_AXIS, PROBE_AXIS


def _check_divisible(mesh, n_frames=None, n_probes=None):
    """Clear errors instead of shard_map's internal uneven-sharding ones."""
    if n_frames is not None:
        f = mesh.shape[FRAME_AXIS]
        if n_frames % f:
            raise ValueError(
                f"n_frames={n_frames} must be divisible by the mesh frame "
                f"extent {f}")
    if n_probes is not None:
        p = mesh.shape[PROBE_AXIS]
        if n_probes % p:
            raise ValueError(
                f"n_probes={n_probes} must be divisible by the mesh probe "
                f"extent {p}")


def run_sharded(positions_frames, probes, spec: SimSpec, mesh):
    """Propagate all (frame, probe) pairs over the mesh.

    Args:
        positions_frames: (n_frames, n_atoms, 3); n_frames must be
            divisible by the mesh's frame extent.
        probes: (n_probes, nx, ny) complex; n_probes must be divisible
            by the probe extent.
        spec: static SimSpec.
        mesh: Mesh with ('frame', 'probe') axes.

    Returns:
        (n_probes, n_frames, nx, ny, n_layers) complex, sharded
        P('probe', 'frame') over the mesh.
    """

    _check_divisible(mesh, n_frames=positions_frames.shape[0],
                     n_probes=probes.shape[0])

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(FRAME_AXIS), P(PROBE_AXIS)),
        out_specs=P(PROBE_AXIS, FRAME_AXIS),
    )
    def block(pos_local, probes_local):
        out = jax.lax.map(lambda p: frame_exit_waves(p, probes_local, spec),
                          pos_local)          # (f_loc, p_loc, nx, ny, layers)
        return jnp.transpose(out, (1, 0, 2, 3, 4))

    return jax.jit(block)(positions_frames, probes)


def tacaw_intensity_sharded(wf, mesh, layer_index: int = -1,
                            crop: bool = True):
    """Frame-sharded WF -> frequency intensity, k-sharded.

    Args:
        wf: (n_probes, n_frames, nx, ny, n_layers) complex, sharded
            P('probe', 'frame') (as produced by run_sharded).
        mesh: the same Mesh.

    Returns:
        (n_probes, n_freq, nx, ny) real intensity, sharded
        P('probe', None, 'frame') — kx is sharded over the mesh axis that
        previously held frames (the all_to_all trades frame locality for
        kx locality so the time FFT is device-local).
    """
    n_layers = wf.shape[-1]
    layer_index = layer_index % n_layers
    _check_divisible(mesh, n_frames=wf.shape[1], n_probes=wf.shape[0])
    nx = wf.shape[2]
    f_extent = mesh.shape[FRAME_AXIS]
    # Grid sizes are odd by construction (int(l/s)+1) — pad kx to a multiple
    # of the frame-axis extent so the all_to_all split is even; the pad
    # stripes are cropped after.
    pad = (-nx) % f_extent

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PROBE_AXIS, FRAME_AXIS),),
        out_specs=P(PROBE_AXIS, None, FRAME_AXIS),
    )
    def block(wf_local):
        x = wf_local[..., layer_index]        # (p_loc, f_loc, nx, ny)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        # Trade the frame axis (sharded, dim 1) for kx (dim 2): after this,
        # every device holds ALL frames for a kx stripe.
        x = jax.lax.all_to_all(x, FRAME_AXIS, split_axis=2, concat_axis=1,
                               tiled=True)
        x = x - jnp.mean(x, axis=1, keepdims=True)
        fft = jnp.fft.fftshift(matfft.fft(x, axis=1), axes=1)
        return jnp.abs(fft) ** 2

    out = jax.jit(block)(wf)
    if pad and crop:
        # User-facing layout: drop the zero pad. For further sharded
        # reductions keep crop=False — the pad rows are exact zeros and
        # vanish in k sums, and the even sharding is preserved.
        out = out[:, :, :nx, :]
    return out


def tacaw_spectrum_sharded(intensity, mesh):
    """Probe-averaged spectrum from sharded intensity.

    Args:
        intensity: (n_probes, n_freq, nx, ny) sharded P('probe', None,
            'frame') (from tacaw_intensity_sharded).

    Returns:
        (n_freq,) replicated: mean over probes of the k-space sum.
    """

    _check_divisible(mesh, n_probes=intensity.shape[0])
    if intensity.shape[2] % mesh.shape[FRAME_AXIS]:
        raise ValueError(
            f"kx extent {intensity.shape[2]} must be divisible by the mesh "
            f"frame extent {mesh.shape[FRAME_AXIS]} (use "
            f"tacaw_intensity_sharded(crop=False) output)")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PROBE_AXIS, None, FRAME_AXIS),),
        out_specs=P(),
    )
    def block(local):
        partial_k = jnp.sum(local, axis=(2, 3))          # (p_loc, n_freq)
        full_k = jax.lax.psum(partial_k, FRAME_AXIS)     # all kx stripes
        probe_sum = jax.lax.psum(jnp.sum(full_k, axis=0), PROBE_AXIS)
        n_probes = local.shape[0] * jax.lax.psum(1, PROBE_AXIS)
        return probe_sum / n_probes

    return jax.jit(block)(intensity)

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


def sharded_mesh_of(arr):
    """The ('frame', 'probe') Mesh an array is sharded over, or None for
    host / single-device / foreign-mesh arrays. The analysis facades use
    this to route mesh-sharded WFData through the shard_map reductions
    below instead of eager global-array ops (which would index
    non-addressable shards on a multi-host mesh)."""
    if not isinstance(arr, jax.Array):
        return None
    from jax.sharding import Mesh, NamedSharding
    import numpy as np
    sh = arr.sharding
    if (isinstance(sh, NamedSharding) and sh.mesh.size > 1
            and {FRAME_AXIS, PROBE_AXIS} <= set(sh.mesh.axis_names)):
        m = sh.mesh
        return Mesh(np.asarray(m.devices), m.axis_names) \
            if not isinstance(m, Mesh) else m
    return None


def _replicate_over_probe(s_local, n_probes):
    """(p_loc, ...) probe-sharded block values -> (n_probes, ...) fully
    replicated, via scatter-into-zeros + psum over the probe axis (psum's
    replication is statically visible to shard_map's out_specs=P() check,
    unlike all_gather's)."""
    i = jax.lax.axis_index(PROBE_AXIS)
    full = jnp.zeros((n_probes,) + s_local.shape[1:], s_local.dtype)
    start = i * s_local.shape[0]
    idx = (start,) + (jnp.zeros((), start.dtype),) * (s_local.ndim - 1)
    full = jax.lax.dynamic_update_slice(full, s_local, idx)
    return jax.lax.psum(full, PROBE_AXIS)


def collected_sharded(wf, mesh, masks, layer_index: int = -1,
                      intensity: bool = False):
    """Mean-over-frames masked k sums of a mesh-sharded WF stack.

    The multi-host-safe core of HAADFData.calculateADF / virtual_image /
    center_of_mass: every reduction over the sharded (probe, frame) axes
    happens inside shard_map (psum over frames, psum-scatter over probes),
    so no host-side op ever touches a potentially non-addressable shard.

    Args:
        wf: (n_probes, n_frames, nx, ny, n_layers) complex, sharded
            P('probe', 'frame').
        masks: (nx, ny) or (n_masks, nx, ny) real detector/weight planes
            (replicated).
        intensity: detect |psi|^2 instead of the reference's |psi|.

    Returns:
        (n_probes, n_masks) float, fully replicated (addressable on every
        process of a multi-host mesh).
    """
    import numpy as np
    _check_divisible(mesh, n_frames=wf.shape[1], n_probes=wf.shape[0])
    n_frames = wf.shape[1]
    li = layer_index % wf.shape[-1]
    # Masks ride the WF's real dtype (f64 in x64 verification mode).
    rdtype = (np.float64 if np.dtype(wf.dtype) == np.complex128
              else np.float32)
    masks = np.asarray(masks, dtype=rdtype)
    if masks.ndim == 2:
        masks = masks[None]

    n_probes = wf.shape[0]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PROBE_AXIS, FRAME_AXIS), P()),
        out_specs=P(),
    )
    def block(wf_local, m):
        x = jnp.abs(wf_local[..., li])
        if intensity:
            x = x * x
        # Contract k per mask without materializing the (p, f, S, nx, ny)
        # broadcast; then the frame mean via psum over the frame axis.
        s = jnp.einsum("pfxy,sxy->ps", x, m)
        s = jax.lax.psum(s, FRAME_AXIS) / n_frames
        return _replicate_over_probe(s, n_probes)

    return jax.jit(block)(wf, jnp.asarray(masks))


def frame_mean_intensity_sharded(wf, mesh, layer_index: int = -1):
    """Frame-averaged detector intensity per probe, fully replicated.

    (n_probes, n_frames, nx, ny, L) sharded P('probe','frame') ->
    (n_probes, nx, ny) |psi|^2 mean over frames — the multi-host-safe core
    of ptychography.scan_grid_data / pacbed. The output is replicated
    (these facades return a full host array by contract), so size it
    accordingly: n_probes * nx * ny floats on every device.
    """
    _check_divisible(mesh, n_frames=wf.shape[1], n_probes=wf.shape[0])
    n_frames = wf.shape[1]
    n_probes = wf.shape[0]
    li = layer_index % wf.shape[-1]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PROBE_AXIS, FRAME_AXIS),),
        out_specs=P(),
    )
    def block(wf_local):
        x = wf_local[..., li]
        s = jnp.sum(jnp.abs(x) ** 2, axis=1)             # (p_loc, nx, ny)
        s = jax.lax.psum(s, FRAME_AXIS) / n_frames
        return _replicate_over_probe(s, n_probes)

    return jax.jit(block)(wf)


def _local_stripe(full_plane, stripe, axis_name):
    """dynamic_slice of a replicated (nx_pad, ...) plane down to this
    device's kx stripe (the FRAME-axis shard of the k-sharded intensity)."""
    i = jax.lax.axis_index(axis_name)
    start = i * stripe
    zeros = (jnp.zeros((), start.dtype),) * (full_plane.ndim - 1)
    return jax.lax.dynamic_slice(
        full_plane, (start,) + zeros,
        (stripe,) + full_plane.shape[1:])


def tacaw_probe_spectra_sharded(intensity, mesh, mask=None):
    """Per-probe spectra from k-sharded TACAW intensity, fully replicated.

    intensity: (n_probes, n_freq, nx_pad, ny) real, sharded
    P('probe', None, 'frame') — tacaw_intensity_sharded(crop=False) output
    (the pad rows are exact zeros and vanish in the k sums). ``mask``:
    optional replicated (nx_pad, ny) detector mask (zero-padded to nx_pad).
    Returns (n_probes, n_freq) — the multi-host-safe core of
    TACAWData.spectrum / spectrum_image / masked_spectrum.
    """
    _check_divisible(mesh, n_probes=intensity.shape[0])
    n_probes = intensity.shape[0]
    f_extent = mesh.shape[FRAME_AXIS]
    if intensity.shape[2] % f_extent:
        raise ValueError(f"kx extent {intensity.shape[2]} not divisible by "
                         f"the mesh frame extent {f_extent} (pass the "
                         "crop=False intensity)")
    stripe = intensity.shape[2] // f_extent

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=((P(PROBE_AXIS, None, FRAME_AXIS),)
                  + ((P(),) if mask is not None else ())),
        out_specs=P())
    def block(local, *m):
        x = local
        if m:
            x = x * _local_stripe(m[0], stripe, FRAME_AXIS)[None, None]
        s = jnp.sum(x, axis=(2, 3))                  # (p_loc, n_freq)
        s = jax.lax.psum(s, FRAME_AXIS)
        return _replicate_over_probe(s, n_probes)

    args = (intensity,) + ((jnp.asarray(mask),) if mask is not None else ())
    return jax.jit(block)(*args)


def tacaw_kplane_sharded(intensity, mesh, probe_weights,
                         freq_index=None):
    """Probe-weighted k plane from k-sharded TACAW intensity, replicated.

    ``probe_weights``: (n_probes,) replicated — 1/n_probes for the
    probe-average semantics, a one-hot for probe_index. ``freq_index``:
    None sums over frequency (TACAWData.diffraction), an int picks the
    slice (spectral_diffraction). Returns (nx_pad, ny) — crop the pad
    rows host-side.
    """
    _check_divisible(mesh, n_probes=intensity.shape[0])
    f_extent = mesh.shape[FRAME_AXIS]
    stripe = intensity.shape[2] // f_extent
    nx_pad = intensity.shape[2]
    p_loc = intensity.shape[0] // mesh.shape[PROBE_AXIS]

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PROBE_AXIS, None, FRAME_AXIS), P(PROBE_AXIS)),
        out_specs=P())
    def block(local, w_loc):
        x = (jnp.sum(local, axis=1) if freq_index is None
             else local[:, freq_index])              # (p_loc, stripe, ny)
        s = jnp.einsum("pxy,p->xy", x, w_loc)
        s = jax.lax.psum(s, PROBE_AXIS)              # all probes weighted
        # replicate the kx stripes over the frame axis: scatter + psum
        i = jax.lax.axis_index(FRAME_AXIS)
        full = jnp.zeros((nx_pad,) + s.shape[1:], s.dtype)
        start = i * stripe
        full = jax.lax.dynamic_update_slice(
            full, s, (start, jnp.zeros((), start.dtype)))
        return jax.lax.psum(full, FRAME_AXIS)

    del p_loc
    return jax.jit(block)(intensity, jnp.asarray(probe_weights))


def tacaw_dispersion_sharded(intensity, mesh, probe_weights, kx_idx,
                             ky_idx):
    """Probe-weighted dispersion curve along a k path, replicated.

    The nearest-neighbor pixel lookup across the SHARDED kx axis runs as
    two one-hot contractions (each device contracts its stripe's rows of
    the selection matrix — no gathers across shards). Returns
    (n_freq, n_k).
    """
    import numpy as np
    _check_divisible(mesh, n_probes=intensity.shape[0])
    f_extent = mesh.shape[FRAME_AXIS]
    nx_pad, ny = intensity.shape[2], intensity.shape[3]
    stripe = nx_pad // f_extent
    n_k = len(kx_idx)
    sx = np.zeros((nx_pad, n_k), np.float32)
    sx[np.asarray(kx_idx), np.arange(n_k)] = 1.0
    sy = np.zeros((ny, n_k), np.float32)
    sy[np.asarray(ky_idx), np.arange(n_k)] = 1.0

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(PROBE_AXIS, None, FRAME_AXIS), P(PROBE_AXIS),
                  P(FRAME_AXIS), P()),
        out_specs=P())
    def block(local, w_loc, sx_loc, sy_rep):
        # picked[p, f, j] = sum_xy I[p, f, x, y] Sx[x, j] Sy[y, j]
        t = jnp.einsum("pfxy,yj->pfxj", local,
                       sy_rep.astype(local.dtype))
        picked = jnp.einsum("pfxj,xj->pfj", t,
                            sx_loc.astype(local.dtype))
        picked = jax.lax.psum(picked, FRAME_AXIS)    # all kx stripes
        out = jnp.einsum("pfj,p->fj", picked, w_loc)
        return jax.lax.psum(out, PROBE_AXIS)

    return jax.jit(block)(intensity, jnp.asarray(probe_weights),
                          jnp.asarray(sx), jnp.asarray(sy))

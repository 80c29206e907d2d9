"""Device-mesh construction for the (frame, probe) parallel axes.

The workload's parallelizable axes (SURVEY §0/§5): MD frames and probe
positions are independent until the time-FFT / probe-averaging reductions.
They map onto a 2-D ``jax.sharding.Mesh`` with axes ``('frame', 'probe')``
riding ICI; in-plane (kx, ky) stays local so the per-slice 2-D FFTs never
communicate.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

FRAME_AXIS = "frame"
PROBE_AXIS = "probe"


def factor_mesh(n_devices: int, n_frames: Optional[int] = None,
                n_probes: Optional[int] = None) -> Tuple[int, int]:
    """Pick (frame, probe) mesh extents for n_devices.

    Prefers sharding frames (the long axis in production TACAW runs); the
    probe extent only grows when the frame count can't absorb all devices or
    when probes are plentiful and frames are not.
    """
    best = (n_devices, 1)
    for f in range(n_devices, 0, -1):
        if n_devices % f:
            continue
        p = n_devices // f
        if n_frames is not None and n_frames % f:
            continue
        if n_probes is not None and n_probes % p:
            continue
        best = (f, p)
        break
    return best


def make_mesh(n_frame_shards: Optional[int] = None,
              n_probe_shards: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with axes ('frame', 'probe') over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_frame_shards is None and n_probe_shards is None:
        n_frame_shards, n_probe_shards = factor_mesh(n)
    elif n_frame_shards is None:
        n_frame_shards = n // n_probe_shards
    elif n_probe_shards is None:
        n_probe_shards = n // n_frame_shards
    if n_frame_shards * n_probe_shards != n:
        raise ValueError(
            f"mesh {n_frame_shards}x{n_probe_shards} != {n} devices")
    arr = np.asarray(devices).reshape(n_frame_shards, n_probe_shards)
    return Mesh(arr, (FRAME_AXIS, PROBE_AXIS))


def initialize_multihost(**kwargs) -> None:
    """Multi-host entry point: call once per process before building a
    mesh, on every host of the pod/cluster (wraps
    ``jax.distributed.initialize``, which reads the TPU pod metadata
    automatically — kwargs like coordinator_address/num_processes/
    process_id are only needed off-TPU)."""
    jax.distributed.initialize(**kwargs)


def make_multihost_mesh(n_probe_shards: int = 1) -> Mesh:
    """('frame', 'probe') mesh for a multi-host job, laid out so the FRAME
    axis crosses hosts over DCN and the PROBE axis stays inside a host on
    ICI.

    Frames are the zero-communication axis (each device propagates its own
    frames; only the final intensity psum crosses frame shards — SURVEY §5's
    "DCN across slices, ICI within"), so the slow inter-host links carry
    almost nothing. Probe shards exchange nothing during propagation but
    share rasterized potentials best over ICI.

    Call ``initialize_multihost()`` first on every process. Single-process
    runs degrade to ``make_mesh`` (useful for the virtual-device tests).
    """
    n_procs = jax.process_count()
    devices = jax.devices()
    n_local = len(devices) // n_procs
    if n_local % n_probe_shards:
        raise ValueError(
            f"probe shards ({n_probe_shards}) must divide the per-host "
            f"device count ({n_local}) so the probe axis stays on ICI")
    if n_procs == 1:
        return make_mesh(None, n_probe_shards, devices)
    from jax.experimental import mesh_utils
    ici_frames = n_local // n_probe_shards
    # Multi-slice TPU pods expose one slice_index per DCN granule (the
    # default grouping). Single-slice multi-host jobs and multi-process CPU
    # runs (the validation story for this path, tests/test_multiproc.py)
    # report one slice — or none — for ALL processes, so the process itself
    # is the DCN granule there.
    slice_ids = {getattr(d, "slice_index", None) for d in devices}
    granule_by_process = (None in slice_ids) or len(slice_ids) != n_procs
    arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(ici_frames, n_probe_shards),       # within a host
        dcn_mesh_shape=(n_procs, 1),                   # frame axis x hosts
        devices=devices,
        process_is_granule=granule_by_process)
    return Mesh(arr, (FRAME_AXIS, PROBE_AXIS))

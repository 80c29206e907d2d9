"""Streaming (online, per-frame) analysis engines.

The reference materializes the full (probes, frames, nx, ny) complex array
up front (calculators.py:161) — TBs at production scale (SURVEY §7 "memory
ceiling": 2048^2 x 1000 frames x 64 probes). These engines never hold more
than one frame of exit waves plus O(selected outputs) of accumulator state,
so the frame axis streams indefinitely:

* ``StreamingTACAW`` — partial time-DFT at a selected set of frequency bins:
  for the fftfreq integer bins, acc_f += psi_t * exp(-2*pi*i*f*t/n). Mean
  subtraction (tacaw_data.py:92-100) only affects the f=0 bin for integer
  bins (sum_t exp(-2*pi*i*f*t/n) == 0 for f != 0), so it is applied as a
  closed-form end correction. Memory: n_selected x probes x nx x ny instead
  of n_frames x probes x nx x ny.
* ``StreamingHAADF`` — running mean over frames of the masked k-space
  amplitude (or intensity) sum per probe; O(probes) state.

Both consume frames in any order (each frame index enters exactly once) and
produce results identical to the batch path at the selected outputs
(tests/test_streaming.py).

Multi-device: ``StreamingTACAW(mesh=...)`` composes BOTH mesh axes with
streaming. Probes shard over the 'probe' axis (accumulation is local, zero
collectives). Frames shard over the 'frame' axis: feed one frame per
frame-row at a time via ``add_frame_block`` — each row accumulates its
frame subset into a local partial accumulator, and ``intensity()`` merges
the partials with one psum. Frame throughput then scales with the frame
extent while memory stays O(selected bins) per device (the config-5 regime:
2048^2, 1000 frames, 64 probes on a pod).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import wavelength as _wavelength
from ..utils.host import device_zeros
from .pipeline import (SimSpec, exit_waves_from_potential,
                       frame_exit_waves)


def _rasterize_in_trace(positions, spec: SimSpec):
    """One frame's potential stack, traced inside the caller's program.
    Probe-chunked folds rasterize ONCE per frame and push every chunk
    through exit_waves_from_potential — re-rasterizing per chunk costs
    C-1 extra full rasterizer passes per frame (measured: the dominant
    term of config 5's per-frame time at C=8)."""
    from ..physics.potential import rasterize_traced_buckets
    from .pipeline import _plan_buckets
    bt, bs = _plan_buckets(spec.plan)
    # jnp.asarray here: the host lists become constants of the CALLER's
    # trace (indexing a raw NumPy array by a traced scan index fails).
    return rasterize_traced_buckets(positions, jnp.asarray(bt),
                                    jnp.asarray(bs), spec.plan,
                                    spec.precision)

# Hoisted jitted helpers (constructing jax.jit(...) per call re-traces a tiny
# program every frame — milliseconds of pure overhead on a 1000-frame stream).
_complex_jit = jax.jit(jax.lax.complex)
_abs2_jit = jax.jit(lambda a: jnp.abs(a) ** 2)
_ksum_jit = jax.jit(lambda x: jnp.sum(x, axis=(2, 3)))


# --- multi-host-safe checkpoint shards ----------------------------------------
#
# SURVEY §5 plans "sharded per-frame-block checkpoints"; round-2 weak #4
# found the save path gathering globally-sharded accumulators to one host
# (to_numpy on the full array). These helpers write/read ONE FILE PER
# ADDRESSABLE SHARD instead: on a real DCN mesh each process touches only
# its own shards (non-addressable shards are never materialized anywhere);
# on a single host the union of shards is the same bytes the old format
# held, just partitioned. Restore rebuilds the global array with
# jax.make_array_from_callback — the callback is invoked only for indices
# this process addresses — and complex state is recombined ON DEVICE from
# two real transfers (the axon relay cannot transfer complex buffers).


def _shard_tag(index) -> str:
    starts = [str(int(s.start) if s.start is not None else 0) for s in index]
    return "_".join(starts) or "0"


def _save_array_shards(d, name: str, arr) -> None:
    """Write each addressable shard of ``arr`` as <name>.s<offsets>.npy
    (atomic: tmp + rename). Never materializes the global array."""
    from ..utils.host import to_numpy
    for sh in arr.addressable_shards:
        tag = _shard_tag(sh.index)
        tmp = d / f"{name}.s{tag}.tmp.npy"
        np.save(tmp, to_numpy(sh.data))
        tmp.replace(d / f"{name}.s{tag}.npy")


def _restore_array_shards(d, name: str, like):
    """Rebuild an array shaped/sharded like ``like`` from shard files.
    Complex dtypes transfer as two real planes and recombine on device."""
    shape, sharding = like.shape, like.sharding
    dtype = like.dtype

    def host_shard(index):
        path = d / f"{name}.s{_shard_tag(index)}.npy"
        if path.exists():
            return np.load(path)
        legacy = d / f"{name}.npy"          # round-2 single-file format
        if legacy.exists():
            return np.load(legacy)[tuple(index)]
        raise ValueError(
            f"checkpoint shard missing: {path.name} — was the "
            "checkpoint written on a different mesh topology?")

    if np.issubdtype(dtype, np.complexfloating):
        rdt = np.float64 if dtype == np.complex128 else np.float32
        re = jax.make_array_from_callback(
            shape, sharding,
            lambda idx: np.ascontiguousarray(host_shard(idx).real
                                             .astype(rdt)))
        im = jax.make_array_from_callback(
            shape, sharding,
            lambda idx: np.ascontiguousarray(host_shard(idx).imag
                                             .astype(rdt)))
        return _complex_jit(re, im)
    return jax.make_array_from_callback(
        shape, sharding,
        lambda idx: np.ascontiguousarray(host_shard(idx).astype(dtype)))


def _digest_addressable(arr) -> str:
    """md5 over the addressable shards (sorted by offset) — deterministic
    per process without gathering a globally-sharded array to one host."""
    import hashlib
    from ..utils.host import to_numpy
    h = hashlib.md5()
    if isinstance(arr, jax.Array):
        shards = sorted(arr.addressable_shards,
                        key=lambda s: tuple(int(sl.start or 0)
                                            for sl in s.index))
        for sh in shards:
            h.update(np.ascontiguousarray(to_numpy(sh.data)).tobytes())
    else:
        h.update(np.ascontiguousarray(np.asarray(arr)).tobytes())
    return h.hexdigest()


def _write_manifest(d, manifest: dict) -> None:
    """Per-process manifest (manifest.p<i>.json): each process records the
    key of ITS shard set — no cross-process coordination needed."""
    import json
    name = f"manifest.p{jax.process_index()}.json"
    tmp = d / (name + ".tmp")
    tmp.write_text(json.dumps(manifest))
    tmp.replace(d / name)


def _read_manifest(d) -> dict:
    import json
    from pathlib import Path
    path = Path(d) / f"manifest.p{jax.process_index()}.json"
    legacy = Path(d) / "manifest.json"
    if not path.exists() and legacy.exists():
        path = legacy
    return json.loads(path.read_text())


@functools.partial(jax.jit, static_argnames=("spec", "layer_index"),
                   donate_argnums=(0, 1))
def _tacaw_accumulate(acc, mean_acc, positions, probes, phases,
                      spec: SimSpec, layer_index: int):
    """One frame: acc[f] += psi * phase[f]; mean_acc += psi. Accumulators
    are donated — updated in place, no double buffering in HBM."""
    psi = frame_exit_waves(positions, probes, spec)[..., layer_index]
    acc = acc + phases[:, None, None, None] * psi[None]
    mean_acc = mean_acc + psi
    return acc, mean_acc


@functools.partial(jax.jit, static_argnames=("spec", "layer_index"),
                   donate_argnums=(0,))
def _tacaw_accumulate_nomean(acc, positions, probes, phases,
                             spec: SimSpec, layer_index: int):
    """Accumulate without the mean tracker (no f=0 bin requested)."""
    psi = frame_exit_waves(positions, probes, spec)[..., layer_index]
    return acc + phases[:, None, None, None] * psi[None]


@functools.partial(jax.jit, static_argnames=("spec", "layer_index"),
                   donate_argnums=(0, 1))
def _tacaw_accumulate_scan(acc, mean_acc, positions_block, probes,
                           phases_block, weights, spec: SimSpec,
                           layer_index: int):
    """B frames folded in ONE dispatch (lax.scan) — through the remote
    relay a dispatch round trip costs 40-1500 ms while one 1-probe frame
    computes in ~8 ms, so per-frame dispatching is pure overhead.
    ``weights`` (B,): 1 for real frames, 0 for tail-padding frames (a
    shorter trailing block pads to the established block size so one
    compiled program serves the whole stream)."""
    weights = weights.astype(np.empty(0, acc.dtype).real.dtype)
    def body(carry, xs):
        acc, mean = carry
        pos, ph, w = xs
        psi = frame_exit_waves(pos, probes, spec)[..., layer_index]
        return (acc + (w * ph)[:, None, None, None] * psi[None],
                mean + w * psi), None
    (acc, mean_acc), _ = jax.lax.scan(
        body, (acc, mean_acc), (positions_block, phases_block, weights))
    return acc, mean_acc


@functools.partial(jax.jit, static_argnames=("spec", "layer_index"),
                   donate_argnums=(0,))
def _tacaw_accumulate_scan_nomean(acc, positions_block, probes,
                                  phases_block, weights, spec: SimSpec,
                                  layer_index: int):
    weights = weights.astype(np.empty(0, acc.dtype).real.dtype)
    def body(acc, xs):
        pos, ph, w = xs
        psi = frame_exit_waves(pos, probes, spec)[..., layer_index]
        return acc + (w * ph)[:, None, None, None] * psi[None], None
    acc, _ = jax.lax.scan(body, acc,
                          (positions_block, phases_block, weights))
    return acc


# Folding every probe chunk of a frame (or block) in ONE jitted program
# replaces the per-chunk Python loop, whose each iteration paid a relayed
# dispatch round trip (~25-150 ms against ~30 ms of compute for an 8-probe
# 2048^2 chunk — measured 1.47 s/frame for config 5's 8 chunks, dominated
# by dispatch). The chunk accumulators stay independent donated buffers
# (tuple arguments), so the in-place update guarantee and the checkpoint
# layout are unchanged; TPU programs execute their ops sequentially, so
# the per-chunk working-set bound survives inside the fused program. The
# unrolled-chunk trace grows linearly in C — callers cap C (see
# _MULTI_CHUNK_CAP) and fall back to the per-chunk loop beyond it.
_MULTI_CHUNK_CAP = 16


def _device_bytes_limit():
    """Device memory capacity in bytes, or None when effectively unbounded
    (CPU hosts). Falls back to the v5e-class 16 GiB when the backend
    exposes no ``memory_stats`` (the remote-relay PJRT plugin doesn't)."""
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return int(limit)
        platform = dev.platform
    except Exception:
        return None
    return None if platform == "cpu" else 16 * 1024 ** 3


def _fused_group_size(accs, means, probes, cap=_MULTI_CHUNK_CAP):
    """Largest number of probe chunks to fold per dispatch (>= 1).

    Folding chunks into one program amortizes BOTH the per-dispatch relay
    round trip AND the potential rasterization (the per-chunk loop
    re-rasterizes ``v`` once per chunk per frame — at config 5's shapes,
    2048^2 x ~15k atoms, that is ~145 ms x 8 chunks = 1.16 s/frame of
    redundant rasterization; measured 1.31 -> 0.85 s/frame when the
    chunk count per dispatch halves the redundancy).

    But the fused program takes every participating accumulator (+ its
    probe range) as a program argument, and through a device relay every
    complex64 boundary buffer is materialized twice — the relay's
    transfer layer carries 64-bit-wide elements as split f32 hi/lo pairs
    (custom-calls X64SplitHigh/Low), so the program holds both the split
    temps and the combined c64 copies at entry/exit. Measured: folding
    all 8 of config 5's chunks (6 GiB accumulators + 2 GiB probes)
    compiles to a 20.75 GiB demand on a 15.75 GiB v5e.

    So pick the largest group size K whose peak fits:

        persistent (all accs + means + probes)
        + K x (acc + mean) split temps
        + 2 x K/C x probes (eager group slice + its split temps)
        + 2 x acc transient (v, exit-wave/FFT workspace)
        <= 0.8 x device limit

    calibrated against the measured 20.75 GiB (model: 18.2 at K=8) —
    the ~0.8 headroom covers what the model doesn't itemize. On backends
    where donation aliases in-place (native PJRT), a smaller K only
    costs extra dispatches (microseconds natively); through the relay a
    larger K would OOM anyway.

    ``PYSLICE_FUSED_CHUNKS`` overrides: ``0``/``false`` forces the
    per-chunk loop, ``1``/``true`` forces full fusion, an integer >= 2
    forces that exact group size.
    """
    import os
    C = len(accs)
    if C <= 1:
        return 1
    env = os.environ.get("PYSLICE_FUSED_CHUNKS")
    if env is not None:
        v = env.strip().lower()
        if v in ("0", "false", "no"):
            return 1
        if v in ("1", "true", "yes"):
            return min(C, cap)
        return max(1, min(int(v), C, cap))
    limit = _device_bytes_limit()
    if limit is None:
        return min(C, cap)
    acc_b = max(int(a.nbytes) for a in accs)
    mean_b = (max(int(m.nbytes) for m in means) if means is not None else 0)
    probes_b = int(probes.nbytes)
    persistent = (sum(int(a.nbytes) for a in accs) + probes_b
                  + (sum(int(m.nbytes) for m in means)
                     if means is not None else 0))
    best = 1
    for K in range(2, min(C, cap) + 1):
        peak = (persistent + K * (acc_b + mean_b)
                + 2 * K * probes_b / C + 2 * acc_b)
        if peak <= 0.8 * limit:
            best = K
    return best


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "bounds"),
                   donate_argnums=(0, 1))
def _tacaw_accumulate_multi(accs, means, positions, probes, phases,
                            spec: SimSpec, layer_index: int, bounds):
    """One frame folded into EVERY probe-chunk accumulator in one dispatch.

    ``bounds``: static ((start, stop), ...) probe-chunk bounds — the full
    probe array is sliced INSIDE the program (transient chunk buffers),
    never duplicated in HBM (a materialized chunk copy of a 2 GB probe
    array OOMs config 5 next to its 8.5 GB accumulator state).

    The optimization_barrier serializes the chunk folds: the unrolled
    chains are independent, so without it XLA's scheduler overlaps them
    and holds several chunks' exit waves live at once (measured +2.7 GB
    past HBM at config 5's shapes) — the barrier releases the potential
    stack ``v`` to the next fold only after the previous one completes,
    restoring the one-chunk working-set bound the per-chunk loop had.
    ``v`` is rasterized ONCE per frame and threaded through the barrier
    (the per-chunk loop re-rasterized it C times per frame)."""
    out_a, out_m = [], []
    v = _rasterize_in_trace(positions, spec)
    for acc, mean, (a, b) in zip(accs, means, bounds):
        pr = jax.lax.slice_in_dim(probes, a, b)
        psi = exit_waves_from_potential(v, pr, spec)[..., layer_index]
        na = acc + phases[:, None, None, None] * psi[None]
        nm = mean + psi
        na, nm, v = jax.lax.optimization_barrier((na, nm, v))
        out_a.append(na)
        out_m.append(nm)
    return tuple(out_a), tuple(out_m)


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "bounds"),
                   donate_argnums=(0,))
def _tacaw_accumulate_multi_nomean(accs, positions, probes, phases,
                                   spec: SimSpec, layer_index: int, bounds):
    out_a = []
    v = _rasterize_in_trace(positions, spec)
    for acc, (a, b) in zip(accs, bounds):
        pr = jax.lax.slice_in_dim(probes, a, b)
        psi = exit_waves_from_potential(v, pr, spec)[..., layer_index]
        na = acc + phases[:, None, None, None] * psi[None]
        na, v = jax.lax.optimization_barrier((na, v))
        out_a.append(na)
    return tuple(out_a)


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "bounds"),
                   donate_argnums=(0, 1))
def _tacaw_accumulate_scan_multi(accs, means, positions_block, probes,
                                 phases_block, weights, spec: SimSpec,
                                 layer_index: int, bounds):
    """B frames x C probe chunks in ONE dispatch (scan over frames,
    chunks unrolled in the body, sliced in-program — see
    _tacaw_accumulate_multi)."""
    weights = weights.astype(np.empty(0, accs[0].dtype).real.dtype)

    def body(carry, xs):
        accs, means = carry
        pos, ph, w = xs
        out_a, out_m = [], []
        v = _rasterize_in_trace(pos, spec)
        for acc, mean, (a, b) in zip(accs, means, bounds):
            pr = jax.lax.slice_in_dim(probes, a, b)
            psi = exit_waves_from_potential(v, pr, spec)[..., layer_index]
            na = acc + (w * ph)[:, None, None, None] * psi[None]
            nm = mean + w * psi
            na, nm, v = jax.lax.optimization_barrier((na, nm, v))
            out_a.append(na)
            out_m.append(nm)
        return (tuple(out_a), tuple(out_m)), None

    (accs, means), _ = jax.lax.scan(
        body, (accs, means), (positions_block, phases_block, weights))
    return accs, means


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "bounds"),
                   donate_argnums=(0,))
def _tacaw_accumulate_scan_multi_nomean(accs, positions_block, probes,
                                        phases_block, weights,
                                        spec: SimSpec, layer_index: int,
                                        bounds):
    weights = weights.astype(np.empty(0, accs[0].dtype).real.dtype)

    def body(accs, xs):
        pos, ph, w = xs
        out_a = []
        v = _rasterize_in_trace(pos, spec)
        for acc, (a, b) in zip(accs, bounds):
            pr = jax.lax.slice_in_dim(probes, a, b)
            psi = exit_waves_from_potential(v, pr, spec)[..., layer_index]
            na = acc + (w * ph)[:, None, None, None] * psi[None]
            na, v = jax.lax.optimization_barrier((na, v))
            out_a.append(na)
        return tuple(out_a), None

    accs, _ = jax.lax.scan(body, accs,
                           (positions_block, phases_block, weights))
    return accs


def _pad_block(pos, extras, target):
    """Pad a (B, ...) frame block to ``target`` frames by repeating the
    last frame, with weights 1 for real and 0 for padded frames. ``extras``
    (each (B, ...)) are zero-padded. Returns (pos, extras..., weights)."""
    b = pos.shape[0]
    w = jnp.ones(b, pos.dtype)
    if b < target:
        pad = target - b
        pos = jnp.concatenate([pos, jnp.repeat(pos[-1:], pad, axis=0)])
        extras = [jnp.concatenate(
            [e, jnp.zeros((pad,) + e.shape[1:], e.dtype)]) for e in extras]
        w = jnp.concatenate([w, jnp.zeros(pad, w.dtype)])
    return (pos, *extras, w)


class StreamingTACAW:
    """Accumulate |Psi(omega, q)|^2 at selected frequencies, frame by frame.

    Args:
        spec: static SimSpec.
        probes: (n_probes, nx, ny) complex probe batch.
        n_frames: total number of frames that will be streamed.
        timestep: MD timestep in ps (frequencies are THz).
        frequencies: target frequencies in THz; each maps to its nearest
            fftfreq bin (same nearest-bin semantics as
            TACAWData.spectral_diffraction). None -> all n_frames bins
            (memory then matches the batch path).
        layer_index: recorded layer to analyze (default: last).
    """

    def __init__(self, spec: SimSpec, probes, n_frames: int, timestep: float,
                 frequencies: Optional[Sequence[float]] = None,
                 layer_index: int = -1, probe_chunk: Optional[int] = None,
                 mesh=None):
        """``mesh``: optional jax Mesh with ('frame', 'probe') axes — probes
        and accumulators shard over 'probe' (accumulation is local, zero
        collectives; the potential rasterizes redundantly per probe shard).
        A frame extent > 1 additionally shards the STREAM: feed one frame
        per frame-row via ``add_frame_block``; each row keeps a partial
        accumulator and ``intensity()`` merges them with one psum.
        Incompatible with probe_chunk (sharding already bounds the per-
        device working set)."""
        self.spec = spec
        self.mesh = mesh
        self._frame_extent = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import FRAME_AXIS, PROBE_AXIS
            if probes.shape[0] % mesh.shape[PROBE_AXIS]:
                raise ValueError(
                    f"n_probes={probes.shape[0]} must be divisible by the "
                    f"mesh probe extent {mesh.shape[PROBE_AXIS]}")
            if probe_chunk is not None:
                raise ValueError("probe_chunk and mesh are mutually exclusive")
            self._frame_extent = int(mesh.shape.get(FRAME_AXIS, 1))
            if n_frames % self._frame_extent:
                raise ValueError(
                    f"n_frames={n_frames} must be divisible by the mesh "
                    f"frame extent {self._frame_extent}")
            probes = jax.device_put(
                probes, NamedSharding(mesh, P(PROBE_AXIS)))
        self.probes = probes
        self.n_frames = int(n_frames)
        self.timestep = float(timestep)
        n_layers = len(spec.record_layers) if spec.record_layers else 1
        self.layer_index = layer_index % n_layers

        all_freqs = np.fft.fftfreq(self.n_frames, d=self.timestep)
        if frequencies is None:
            self.bins = np.arange(self.n_frames)
        else:
            self.bins = np.array([int(np.argmin(np.abs(all_freqs - f)))
                                  for f in frequencies])
        self.frequencies = all_freqs[self.bins]
        # The mean tracker only matters for the f=0 bin; drop it (and its
        # HBM) when 0 isn't requested.
        self._track_mean = bool(np.any(self.bins == 0))

        n_probes, nx, ny = probes.shape
        self.probe_chunk = min(probe_chunk or n_probes, n_probes)
        prec = spec.precision
        # Accumulators live as independent per-probe-chunk arrays so the
        # donated in-place update actually happens per chunk (a slice of one
        # big array would copy and defeat donation).
        self._chunk_slices = [slice(c, min(c + self.probe_chunk, n_probes))
                              for c in range(0, n_probes, self.probe_chunk)]
        nb = len(self.bins)

        if self._frame_extent > 1:
            self._init_frame_sharded(nb, n_probes, nx, ny)
            self._seen = set()
            return

        def zeros(p):
            return jax.jit(lambda: (jnp.zeros((nb, p, nx, ny), prec.complex),
                                    jnp.zeros((p, nx, ny), prec.complex)
                                    if self._track_mean else
                                    jnp.zeros((), prec.complex)))()
        pairs = [zeros(sl.stop - sl.start) for sl in self._chunk_slices]
        self._acc_chunks = [a for a, _ in pairs]
        self._mean_chunks = ([m for _, m in pairs] if self._track_mean
                             else None)
        # static chunk bounds for the fused multi-chunk programs (they
        # slice the full probe array in-program — no HBM duplication)
        self._chunk_bounds = tuple((sl.start, sl.stop)
                                   for sl in self._chunk_slices)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import PROBE_AXIS
            acc_s = NamedSharding(self.mesh, P(None, PROBE_AXIS))
            mean_s = NamedSharding(self.mesh, P(PROBE_AXIS))
            self._acc_chunks = [jax.device_put(a, acc_s)
                                for a in self._acc_chunks]
            if self._track_mean:
                self._mean_chunks = [jax.device_put(m, mean_s)
                                     for m in self._mean_chunks]
        self._seen = set()
        # Chunks fold in fused groups of K per dispatch, K picked so the
        # group's boundary footprint fits the device (_fused_group_size);
        # K == 1 keeps the legacy per-chunk loop.
        self._fuse_group = _fused_group_size(
            self._acc_chunks, self._mean_chunks, self.probes)

    def _fused_groups(self):
        """((g0, g1, probes_range, rel_bounds), ...) — consecutive chunk
        groups of ``self._fuse_group``; each group's probe range is sliced
        eagerly (bounds shifted to it) so the dispatch boundary carries
        only the group's probes, never the full array (the full-fusion
        group passes ``self.probes`` itself — no copy)."""
        K = self._fuse_group
        C = len(self._chunk_slices)
        out = []
        for g0 in range(0, C, K):
            g1 = min(g0 + K, C)
            p0 = self._chunk_bounds[g0][0]
            p1 = self._chunk_bounds[g1 - 1][1]
            pr = (self.probes if (p0 == 0 and p1 == self.probes.shape[0])
                  else self.probes[p0:p1])
            rel = tuple((a - p0, b - p0)
                        for a, b in self._chunk_bounds[g0:g1])
            out.append((g0, g1, pr, rel))
        return out

    # --- frame-sharded streaming (mesh frame extent > 1) ---------------------

    def _init_frame_sharded(self, nb, n_probes, nx, ny):
        """Per-frame-row partial accumulators, merged by one psum at
        intensity(): acc has a leading frame-row axis sharded over 'frame'
        (each row holds the partial sum of ITS streamed frame subset), and
        add_frame_block feeds one frame per row per call — frame throughput
        scales with the frame extent, memory stays O(bins) per device."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import FRAME_AXIS, PROBE_AXIS

        mesh = self.mesh
        spec = self.spec
        layer_index = self.layer_index
        F = self._frame_extent
        prec = spec.precision
        track_mean = self._track_mean

        acc_s = NamedSharding(mesh, P(FRAME_AXIS, None, PROBE_AXIS))
        mean_s = NamedSharding(mesh, P(FRAME_AXIS, PROBE_AXIS))
        self._acc_f = jax.jit(
            lambda: jnp.zeros((F, nb, n_probes, nx, ny), prec.complex),
            out_shardings=acc_s)()
        self._mean_f = (jax.jit(
            lambda: jnp.zeros((F, n_probes, nx, ny), prec.complex),
            out_shardings=mean_s)() if track_mean else None)

        in_common = (P(FRAME_AXIS), P(PROBE_AXIS), P(FRAME_AXIS))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(FRAME_AXIS, None, PROBE_AXIS),
                      P(FRAME_AXIS, PROBE_AXIS)) + in_common,
            out_specs=(P(FRAME_AXIS, None, PROBE_AXIS),
                       P(FRAME_AXIS, PROBE_AXIS)))
        def acc_block(acc, mean, pos, probes_l, phases):
            psi = frame_exit_waves(pos[0], probes_l, spec)[..., layer_index]
            acc = acc + (phases[0][:, None, None, None] * psi[None])[None]
            mean = mean + psi[None]
            return acc, mean

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(FRAME_AXIS, None, PROBE_AXIS),) + in_common,
            out_specs=P(FRAME_AXIS, None, PROBE_AXIS))
        def acc_block_nomean(acc, pos, probes_l, phases):
            psi = frame_exit_waves(pos[0], probes_l, spec)[..., layer_index]
            return acc + (phases[0][:, None, None, None] * psi[None])[None]

        self._acc_block = jax.jit(acc_block, donate_argnums=(0, 1))
        self._acc_block_nomean = jax.jit(acc_block_nomean, donate_argnums=(0,))

        zero_mask_np = (self.bins == 0).astype(np.dtype(prec.real))

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(FRAME_AXIS, None, PROBE_AXIS),
                      P(FRAME_AXIS, PROBE_AXIS), P()),
            out_specs=P(None, PROBE_AXIS))
        def finish(acc, mean, zero_mask):
            total = jax.lax.psum(acc[0], FRAME_AXIS)
            m = jax.lax.psum(mean[0], FRAME_AXIS)
            corrected = total - (zero_mask[:, None, None, None]
                                 .astype(total.dtype) * m[None])
            return jnp.abs(corrected) ** 2

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(FRAME_AXIS, None, PROBE_AXIS),),
            out_specs=P(None, PROBE_AXIS))
        def finish_nomean(acc):
            total = jax.lax.psum(acc[0], FRAME_AXIS)
            return jnp.abs(total) ** 2

        self._zero_mask_np = zero_mask_np
        self._finish_f = jax.jit(finish)
        self._finish_f_nomean = jax.jit(finish_nomean)

    def add_frame_block(self, frame_indices, positions_block) -> None:
        """Feed one frame per mesh frame-row (frame extent F frames at once).

        Args:
            frame_indices: sequence of F frame indices (each streamed index
                must enter exactly once over the whole run).
            positions_block: (F, n_atoms, 3) — frame f's positions in row f.
        """
        F = self._frame_extent
        frame_indices = [int(t) for t in frame_indices]
        if F == 1:
            # single-device: ANY block size — the whole block folds in as
            # one jitted scan per probe chunk (one relay dispatch instead
            # of one per frame; see _tacaw_accumulate_scan).
            self._add_frames_scan(frame_indices, positions_block)
            return
        if len(frame_indices) != F:
            raise ValueError(
                f"add_frame_block needs exactly {F} frames per call "
                f"(mesh frame extent); got {len(frame_indices)}")
        pos = jnp.asarray(positions_block)
        if pos.ndim != 3 or pos.shape[0] != F:
            raise ValueError(f"positions_block must be ({F}, n_atoms, 3)")
        phases = self._phases_block(frame_indices)
        dup = self._seen.intersection(frame_indices)
        if dup or len(set(frame_indices)) != F:
            raise ValueError(f"frame indices fed more than once: "
                             f"{sorted(dup) or frame_indices}")
        if self._track_mean:
            self._acc_f, self._mean_f = self._acc_block(
                self._acc_f, self._mean_f, pos, self.probes, phases)
        else:
            self._acc_f = self._acc_block_nomean(
                self._acc_f, pos, self.probes, phases)
        self._seen.update(frame_indices)

    @property
    def _acc(self):
        """Full accumulator view (concatenated over probe chunks)."""
        if len(self._acc_chunks) == 1:
            return self._acc_chunks[0]
        return jnp.concatenate(self._acc_chunks, axis=1)

    def _phases_block(self, frame_indices):
        """exp(-2 pi i f t / n) factors for a block of frames, (B, n_bins)
        complex — ONE construction shared by the sharded and scan block
        paths (the association order is load-bearing for the
        bit-identical-feeding guarantee)."""
        phase = (-2.0 * np.pi / self.n_frames) * np.outer(
            np.asarray([int(t) for t in frame_indices], dtype=np.float64),
            self.bins.astype(np.float64))
        prec = self.spec.precision
        return _complex_jit(
            jnp.asarray(np.cos(phase).astype(np.dtype(prec.real))),
            jnp.asarray(np.sin(phase).astype(np.dtype(prec.real))))

    def _phases(self, t: int):
        # exp(-2*pi*i * f * t / n) for each selected bin f.
        phase = -2.0 * np.pi * self.bins.astype(np.float64) * t / self.n_frames
        prec = self.spec.precision
        re = np.cos(phase).astype(np.dtype(prec.real))
        im = np.sin(phase).astype(np.dtype(prec.real))
        return _complex_jit(jnp.asarray(re), jnp.asarray(im))

    def _add_frames_scan(self, frame_indices, positions_block) -> None:
        B = len(frame_indices)
        dup = self._seen.intersection(frame_indices)
        if dup or len(set(frame_indices)) != B:
            raise ValueError(f"frame indices fed more than once: "
                             f"{sorted(dup) or frame_indices}")
        pos = jnp.asarray(positions_block)
        if pos.ndim != 3 or pos.shape[0] != B:
            raise ValueError(
                f"positions_block must be ({B}, n_atoms, 3), "
                f"got {pos.shape}")
        if B == 1:
            self.add_frame(frame_indices[0], pos[0])
            return
        phases = self._phases_block(frame_indices)
        # Pad a shorter trailing block to the largest block size this
        # stream has seen (weights zero the padded frames) so the whole
        # stream reuses ONE compiled scan program — a fresh block-size
        # shape costs a full compile (tens of seconds through the relay).
        self._scan_block = max(getattr(self, "_scan_block", 0), B)
        pos, phases, w = _pad_block(pos, [jnp.asarray(phases)],
                                    self._scan_block)
        if self._fuse_group > 1:
            # chunks fold in fused groups of K per dispatch: one relay
            # round trip AND one rasterization per frame per GROUP
            # instead of per chunk (see _fused_group_size)
            for g0, g1, pr, rel in self._fused_groups():
                if self._track_mean:
                    accs, means = _tacaw_accumulate_scan_multi(
                        tuple(self._acc_chunks[g0:g1]),
                        tuple(self._mean_chunks[g0:g1]),
                        pos, pr, phases, w, self.spec,
                        self.layer_index, rel)
                    self._acc_chunks[g0:g1] = accs
                    self._mean_chunks[g0:g1] = means
                else:
                    self._acc_chunks[g0:g1] = \
                        _tacaw_accumulate_scan_multi_nomean(
                            tuple(self._acc_chunks[g0:g1]), pos, pr,
                            phases, w, self.spec, self.layer_index, rel)
            self._seen.update(frame_indices)
            return
        for i, sl in enumerate(self._chunk_slices):
            if self._track_mean:
                self._acc_chunks[i], self._mean_chunks[i] = \
                    _tacaw_accumulate_scan(
                        self._acc_chunks[i], self._mean_chunks[i], pos,
                        self.probes[sl], phases, w, self.spec,
                        self.layer_index)
            else:
                self._acc_chunks[i] = _tacaw_accumulate_scan_nomean(
                    self._acc_chunks[i], pos, self.probes[sl], phases, w,
                    self.spec, self.layer_index)
        self._seen.update(frame_indices)

    def add_frame(self, frame_index: int, positions) -> None:
        """Feed one MD frame (each index exactly once, any order).

        Probe chunking bounds the per-frame working set: each chunk's exit
        waves are computed and folded into the (donated, in-place)
        accumulator before the next chunk's propagation starts.
        """
        if self._frame_extent > 1:
            raise ValueError(
                "this stream is frame-sharded (mesh frame extent "
                f"{self._frame_extent} > 1); feed frames through "
                "add_frame_block")
        if int(frame_index) in self._seen:
            raise ValueError(f"frame {int(frame_index)} already streamed")
        pos = jnp.asarray(positions)
        phases = self._phases(int(frame_index))
        if self._fuse_group > 1:
            # chunks fold in fused groups of K per dispatch: one relay
            # round trip AND one rasterization per GROUP instead of per
            # chunk (see _fused_group_size)
            for g0, g1, pr, rel in self._fused_groups():
                if self._track_mean:
                    accs, means = _tacaw_accumulate_multi(
                        tuple(self._acc_chunks[g0:g1]),
                        tuple(self._mean_chunks[g0:g1]),
                        pos, pr, phases, self.spec,
                        self.layer_index, rel)
                    self._acc_chunks[g0:g1] = accs
                    self._mean_chunks[g0:g1] = means
                else:
                    self._acc_chunks[g0:g1] = _tacaw_accumulate_multi_nomean(
                        tuple(self._acc_chunks[g0:g1]), pos, pr,
                        phases, self.spec, self.layer_index, rel)
            self._seen.add(int(frame_index))
            return
        for i, sl in enumerate(self._chunk_slices):
            if self._track_mean:
                self._acc_chunks[i], self._mean_chunks[i] =                     _tacaw_accumulate(self._acc_chunks[i],
                                      self._mean_chunks[i], pos,
                                      self.probes[sl], phases, self.spec,
                                      self.layer_index)
            else:
                self._acc_chunks[i] = _tacaw_accumulate_nomean(
                    self._acc_chunks[i], pos, self.probes[sl], phases,
                    self.spec, self.layer_index)
        self._seen.add(int(frame_index))

    def intensity(self):
        """(n_selected, n_probes, nx, ny) real intensity (device array).

        Applies the mean-subtraction correction: only the f=0 bin is
        affected for integer bins (X0 - n*mean == 0 exactly).
        """
        if len(self._seen) != self.n_frames:
            raise ValueError(
                f"streamed {len(self._seen)} of {self.n_frames} frames")
        if self._frame_extent > 1:
            if self._track_mean:
                return self._finish_f(self._acc_f, self._mean_f,
                                      jnp.asarray(self._zero_mask_np))
            return self._finish_f_nomean(self._acc_f)
        if not self._track_mean:
            chunks = [_abs2_jit(a) for a in self._acc_chunks]
            return (chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks, axis=1))
        zero_mask = jnp.asarray((self.bins == 0).astype(np.float32))

        @jax.jit
        def finish(acc, mean):
            corrected = acc - (zero_mask[:, None, None, None]
                               .astype(acc.dtype)) * mean[None]
            return jnp.abs(corrected) ** 2
        chunks = [finish(a, m) for a, m in zip(self._acc_chunks,
                                               self._mean_chunks)]
        return (chunks[0] if len(chunks) == 1
                else jnp.concatenate(chunks, axis=1))

    def spectrum(self, probe_index: Optional[int] = None) -> np.ndarray:
        """k-summed spectrum at the selected bins (host array)."""
        inten = self.intensity()
        if self.mesh is not None:
            # Multi-host-safe: the k sum + probe replication run inside
            # shard_map (the intensity is P(None, 'probe')-sharded; an
            # eager np.asarray of its jitted k sum would index
            # non-addressable shards on a DCN mesh).
            import functools as _ft
            from jax.sharding import PartitionSpec as P
            from ..parallel.mesh import PROBE_AXIS
            from ..parallel.sharded import _replicate_over_probe
            n_probes = inten.shape[1]

            @_ft.partial(jax.shard_map, mesh=self.mesh,
                         in_specs=(P(None, PROBE_AXIS, None, None),),
                         out_specs=P())
            def ksum(local):
                t = jnp.sum(local, axis=(2, 3))          # (n_sel, p_loc)
                full = _replicate_over_probe(t.T, n_probes)
                return full.T                            # (n_sel, n_probes)

            s = np.asarray(jax.device_get(jax.jit(ksum)(inten)))
        else:
            s = np.asarray(_ksum_jit(inten))     # (n_sel, n_probes)
        if probe_index is None:
            return s.mean(axis=1)
        return s[:, probe_index]

    # --- checkpoint / resume --------------------------------------------------
    #
    # Mid-trajectory crash-resume for streamed runs (SURVEY §5's
    # "sharded per-frame-block checkpoints" plan): the accumulator state plus
    # the set of frames already folded in, written per ADDRESSABLE SHARD
    # (one file per shard of each accumulator array — see
    # _save_array_shards) under a tree keyed by the stream's config hash.
    # No global array is ever gathered to one host, so the same code is
    # correct on a multi-host DCN mesh (each process saves/restores only
    # its own shards; round-2 weak #4). Resume = build an identically-
    # configured stream, restore(), and feed only the remaining frames;
    # results are bit-identical because accumulation order within each
    # accumulator is preserved exactly.

    def checkpoint_key(self) -> str:
        """md5-12 over everything that must match for a restore to be valid
        (same idea as the calculator's frame-cache key, calculators.py:78-94).
        The probes digest covers the locally-addressable shards only — on a
        multi-host mesh each process keys its own shard set, which is
        exactly what it restores."""
        import hashlib
        g = self.spec.grid
        probes_digest = _digest_addressable(self.probes)
        mesh_shape = (tuple(sorted(self.mesh.shape.items()))
                      if self.mesh is not None else None)
        params = str((g.nx, g.ny, g.nz, self.spec.eV, self.spec.dz,
                      self.spec.record_layers, self.layer_index,
                      self.n_frames, self.timestep,
                      tuple(int(b) for b in self.bins), probes_digest,
                      mesh_shape, tuple(s.start for s in self._chunk_slices),
                      self._frame_extent))
        # NOTE: process identity is deliberately NOT in the key — the
        # manifest file is already per-process (manifest.p<i>.json) and the
        # probes digest covers this process's shard set; including it would
        # also invalidate every pre-existing single-host checkpoint.
        return hashlib.md5(params.encode()).hexdigest()[:12]

    def _shard_arrays(self):
        """Name -> device array mapping of all accumulator shards."""
        if self._frame_extent > 1:
            out = {"acc_f": self._acc_f}
            if self._track_mean:
                out["mean_f"] = self._mean_f
            return out
        out = {f"acc_{i}": a for i, a in enumerate(self._acc_chunks)}
        if self._track_mean:
            out.update({f"mean_{i}": m
                        for i, m in enumerate(self._mean_chunks)})
        return out

    def save_checkpoint(self, directory) -> None:
        """Write accumulators + progress to ``directory`` — one file per
        addressable shard (atomic: temp files then manifest rename last);
        no global array is ever gathered to one host."""
        from pathlib import Path
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        for name, arr in self._shard_arrays().items():
            _save_array_shards(d, name, arr)
        _write_manifest(d, {
            "key": self.checkpoint_key(),
            "seen": sorted(int(t) for t in self._seen),
            "n_frames": self.n_frames,
        })

    def restore(self, directory) -> set:
        """Load a checkpoint written by an identically-configured stream
        on the same mesh topology. Returns the set of frame indices already
        folded in (feed the rest). Raises ValueError on config mismatch."""
        from pathlib import Path
        d = Path(directory)
        manifest = _read_manifest(d)
        if manifest["key"] != self.checkpoint_key():
            raise ValueError(
                "checkpoint config mismatch: the stream's parameters "
                f"(key {self.checkpoint_key()}) differ from the checkpoint's "
                f"(key {manifest['key']})")

        if self._frame_extent > 1:
            self._acc_f = _restore_array_shards(d, "acc_f", self._acc_f)
            if self._track_mean:
                self._mean_f = _restore_array_shards(d, "mean_f",
                                                     self._mean_f)
        else:
            self._acc_chunks = [_restore_array_shards(d, f"acc_{i}", a)
                                for i, a in enumerate(self._acc_chunks)]
            if self._track_mean:
                self._mean_chunks = [
                    _restore_array_shards(d, f"mean_{i}", m)
                    for i, m in enumerate(self._mean_chunks)]
        self._seen = set(int(t) for t in manifest["seen"])
        return set(self._seen)


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "intensity"),
                   donate_argnums=(0,))
def _haadf_accumulate(acc, positions, probes, mask, spec: SimSpec,
                      layer_index: int, intensity: bool):
    psi = frame_exit_waves(positions, probes, spec)[..., layer_index]
    amp = jnp.abs(psi)
    if intensity:
        amp = amp * amp
    return acc + jnp.sum(amp * mask[None], axis=(1, 2))


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "intensity"),
                   donate_argnums=(0,))
def _haadf_accumulate_scan(acc, positions_block, probes, mask, weights,
                           spec: SimSpec, layer_index: int,
                           intensity: bool):
    """B frames folded in ONE dispatch (relay-latency amortization —
    same rationale as _tacaw_accumulate_scan). ``weights`` zero the
    tail-padding frames (see _pad_block); they are cast to the carry's
    real dtype so float64 inputs (CPU x64) cannot promote the carry."""
    weights = weights.astype(np.empty(0, acc.dtype).real.dtype)
    def body(acc, xs):
        pos, w = xs
        psi = frame_exit_waves(pos, probes, spec)[..., layer_index]
        amp = jnp.abs(psi)
        if intensity:
            amp = amp * amp
        return acc + w * jnp.sum(amp * mask[None], axis=(1, 2)), None
    acc, _ = jax.lax.scan(body, acc, (positions_block, weights))
    return acc


def _haadf_frame_values_chunked(positions, probes, mask, spec: SimSpec,
                                layer_index: int, intensity: bool,
                                chunk: int):
    """(n_probes,) detector values for one frame, computed chunk-by-chunk
    INSIDE the program: scan over the full chunks (per-chunk working-set
    bound preserved — the scan body holds one chunk's exit waves), plus
    one unrolled ragged-tail fold. The probe array is sliced in-program —
    never duplicated or padded in HBM. The potential is rasterized ONCE
    per frame (a scan-invariant closure constant of the chunk body)."""
    n = probes.shape[0]
    C = n // chunk
    v = _rasterize_in_trace(positions, spec)

    def body(_, p):
        psi = exit_waves_from_potential(v, p, spec)[..., layer_index]
        amp = jnp.abs(psi)
        if intensity:
            amp = amp * amp
        return None, jnp.sum(amp * mask[None], axis=(1, 2))

    head = jax.lax.slice_in_dim(probes, 0, C * chunk)
    _, vals = jax.lax.scan(body, None,
                           head.reshape(C, chunk, *probes.shape[1:]))
    vals = vals.reshape(C * chunk)
    if n % chunk:
        _, tail_vals = body(None, jax.lax.slice_in_dim(probes, C * chunk, n))
        vals = jnp.concatenate([vals, tail_vals])
    return vals


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "intensity",
                                    "chunk"))
def _haadf_accumulate_chunked(acc, positions, probes, mask,
                              spec: SimSpec, layer_index: int,
                              intensity: bool, chunk: int):
    """Probe-chunked single-frame fold in ONE dispatch — the per-chunk
    Python loop's relayed dispatch round trips (~25-150 ms each)
    collapse to one."""
    return acc + _haadf_frame_values_chunked(positions, probes, mask, spec,
                                             layer_index, intensity, chunk)


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "intensity",
                                    "chunk"))
def _haadf_accumulate_scan_chunked(acc, positions_block, probes,
                                   mask, weights, spec: SimSpec,
                                   layer_index: int, intensity: bool,
                                   chunk: int):
    """B frames x C probe chunks in ONE dispatch (outer scan over frames,
    inner scan over the probe-chunk axis). ``weights`` zero the
    tail-padding frames (_pad_block), cast to the carry's real dtype."""
    weights = weights.astype(np.empty(0, acc.dtype).real.dtype)

    def frame_body(acc, xs):
        pos, w = xs
        vals = _haadf_frame_values_chunked(pos, probes, mask, spec,
                                           layer_index, intensity, chunk)
        return acc + w * vals, None

    acc, _ = jax.lax.scan(frame_body, acc, (positions_block, weights))
    return acc


@functools.partial(jax.jit,
                   static_argnames=("spec", "layer_index", "intensity"))
def _haadf_chunk_values(positions, probes, mask, spec: SimSpec,
                        layer_index: int, intensity: bool):
    """(chunk,) detector values for one probe chunk of one frame —
    bounds the working set to chunk * nx * ny exit waves (a 4,096-probe
    production scan cannot hold all exit waves in HBM at once)."""
    psi = frame_exit_waves(positions, probes, spec)[..., layer_index]
    amp = jnp.abs(psi)
    if intensity:
        amp = amp * amp
    return jnp.sum(amp * mask[None], axis=(1, 2))


class StreamingHAADF:
    """Running ADF accumulation: mean over frames of the annular-masked
    k-space amplitude sum per probe (haadf_data.py:43-65 semantics).

    ``mesh``: optional ('frame', 'probe') Mesh — probes/accumulators shard
    over 'probe'; a frame extent > 1 shards the stream (one frame per
    frame-row via ``add_frame_block``, partial accumulators merged by a
    psum at ``image()``), mirroring StreamingTACAW.
    """

    def __init__(self, spec: SimSpec, probes, probe_positions,
                 collection_angle: float = 45, eV: Optional[float] = None,
                 intensity: bool = False, layer_index: int = -1,
                 mesh=None, mrad: Optional[float] = None,
                 use_smatrix: Optional[bool] = None, prism_f: int = 1,
                 aberrations=None, defocus: float = 0.0,
                 beam_chunk: int = 64, probe_chunk: Optional[int] = None,
                 synth_chunk: int = 128):
        """``mrad``/``use_smatrix``/``prism_f``: large scans route each
        frame through the S-matrix (engine.smatrix) instead of
        propagating every probe — build the aperture basis once per
        frame, then synthesize + reduce each probe with one MXU matmul.
        use_smatrix=None auto-dispatches above the measured crossover
        (smatrix_auto: ~2,000 probes at f=1 on one chip); passing
        ``mrad`` (the aperture) is what arms the auto-dispatch, since
        this class otherwise only sees the pre-shifted probe array.
        ``aberrations``/``defocus`` describe the base probe for exact
        coefficient synthesis (they must match how ``probes`` was
        built). f=1 is exact; f>1 is the PRISM approximation. With a
        frame extent of 1 the basis build shards its beams over the
        whole mesh; with frame extent > 1 each frame row builds its own
        frame's basis (beams sharded over the row's probe axis, synthesis
        via psum_scatter) — frame parallelism and the S-matrix path
        compose. ``synth_chunk`` bounds the synthesis matmul's probe
        rows.

        ``probe_chunk``: direct-path HBM bound — at most this many
        probes' exit waves live at once (a 4,096-probe 1024^2 scan is
        ~34 GB of exit waves, far beyond one chip's HBM). None = all at
        once. Mutually exclusive with a mesh (sharding already bounds
        the per-device working set)."""
        self.spec = spec
        self.mesh = mesh
        self._frame_extent = 1
        if probes is None and not use_smatrix:
            # The S-matrix path never touches the probe array (it
            # synthesizes from coefficients) — a 4,096-probe 1024^2 scan's
            # probes alone are ~34 GB, so large scans pass probes=None
            # with use_smatrix=True.
            raise ValueError("probes=None requires use_smatrix=True")
        if mesh is not None and probes is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import FRAME_AXIS, PROBE_AXIS
            if probes.shape[0] % mesh.shape[PROBE_AXIS]:
                raise ValueError(
                    f"n_probes={probes.shape[0]} must be divisible by the "
                    f"mesh probe extent {mesh.shape[PROBE_AXIS]}")
            self._frame_extent = int(mesh.shape.get(FRAME_AXIS, 1))
            probes = jax.device_put(
                probes, NamedSharding(mesh, P(PROBE_AXIS)))
        self.probes = probes
        self.probe_positions = np.asarray(probe_positions, dtype=np.float64)
        self.intensity = bool(intensity)
        n_layers = len(spec.record_layers) if spec.record_layers else 1
        self.layer_index = layer_index % n_layers

        lam = _wavelength(eV if eV is not None else spec.eV)
        if spec.ksq2d is not None:
            # Oblique cell: true |k| from the metric (matches HAADFData).
            q = np.sqrt(np.fft.fftshift(np.asarray(spec.ksq2d)))
        else:
            # Reference-parity mask: built on the *nominal*
            # (requested-sampling) k axes (quirk #12).
            kxs = spec.grid.kxs_nominal_shifted()
            kys = spec.grid.kys_nominal_shifted()
            q = np.sqrt(kxs[:, None] ** 2 + kys[None, :] ** 2)
        radius = (collection_angle * 1e-3) / lam
        self._mask = jnp.asarray((q > radius).astype(
            np.dtype(spec.precision.real)))
        n_probes = (probes.shape[0] if probes is not None
                    else len(self.probe_positions))
        if probes is not None and probes.shape[0] != \
                len(self.probe_positions):
            raise ValueError(
                f"probes ({probes.shape[0]}) and probe_positions "
                f"({len(self.probe_positions)}) disagree")
        prec = spec.precision
        self._n = 0
        self._seen = set()      # frame indices, when callers provide them

        # --- S-matrix scan path (round-3 item 4) -------------------------
        from .smatrix import smatrix_auto
        g = spec.grid
        if use_smatrix is None:
            use_smatrix = (mrad is not None
                           and smatrix_auto(n_probes, mrad, spec.ksq2d,
                                            g.nx, g.ny, prism_f))
        if use_smatrix:
            if mrad is None:
                raise ValueError("use_smatrix=True needs the probe "
                                 "aperture (mrad=...)")
            from .smatrix import build_beams
            self._beams = build_beams(g.xs, g.ys, mrad,
                                      eV if eV is not None else spec.eV,
                                      f=prism_f)
            if prism_f == 1:
                self._sm_weights = self._mask      # exact detector parity
            else:
                wlam = _wavelength(eV if eV is not None else spec.eV)
                wx, wy = g.nx // prism_f, g.ny // prism_f
                kxs_w = np.fft.fftshift(np.fft.fftfreq(wx, d=g.dx))
                kys_w = np.fft.fftshift(np.fft.fftfreq(wy, d=g.dy))
                qw = np.sqrt(kxs_w[:, None] ** 2 + kys_w[None, :] ** 2)
                self._sm_weights = jnp.asarray(
                    (qw > (collection_angle * 1e-3) / wlam).astype(
                        np.dtype(spec.precision.real)))
            self._sm_kwargs = dict(aberrations=aberrations,
                                   defocus=defocus,
                                   probe_chunk=synth_chunk)
            self._beam_chunk = beam_chunk
        self.use_smatrix = bool(use_smatrix)

        if self._frame_extent > 1:
            if self.use_smatrix:
                # Frame-sharded S-matrix (round-4 item 4): each frame row
                # builds ITS OWN frame's beam basis, beams sharded over the
                # row's probe axis; synthesis contracts the beam-sharded S
                # rows with a psum_scatter so each device reduces exactly
                # its local probes. Frame parallelism and the 3.6x S-matrix
                # scan path now compose (the config-5 production layout).
                self._init_frame_sharded_smatrix(n_probes, prec, synth_chunk)
            else:
                self._init_frame_sharded_haadf(n_probes, prec)
        else:
            self._acc = device_zeros((n_probes,), prec.real)
        if probe_chunk is not None and mesh is not None:
            raise ValueError("probe_chunk and mesh are mutually exclusive")
        self.probe_chunk = probe_chunk

    def _init_frame_sharded_haadf(self, n_probes, prec):
        import functools as _ft
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..parallel.mesh import FRAME_AXIS, PROBE_AXIS
        mesh = self.mesh
        F = self._frame_extent
        spec = self.spec
        layer_index = self.layer_index
        intensity = self.intensity
        self._acc = jax.jit(
            lambda: jnp.zeros((F, n_probes), prec.real),
            out_shardings=NamedSharding(mesh, P(FRAME_AXIS, PROBE_AXIS)))()

        @_ft.partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(FRAME_AXIS, PROBE_AXIS), P(FRAME_AXIS),
                               P(PROBE_AXIS), P()),
                     out_specs=P(FRAME_AXIS, PROBE_AXIS))
        def acc_block(acc, pos, probes_l, mask):
            psi = frame_exit_waves(pos[0], probes_l, spec)[..., layer_index]
            amp = jnp.abs(psi)
            if intensity:
                amp = amp * amp
            return acc + jnp.sum(amp * mask[None], axis=(1, 2))[None]

        @_ft.partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(FRAME_AXIS, PROBE_AXIS),),
                     out_specs=P())
        def merge(acc):
            # fully replicated (multi-host-safe np.asarray in image())
            from ..parallel.sharded import _replicate_over_probe
            return _replicate_over_probe(
                jax.lax.psum(acc[0], FRAME_AXIS), n_probes)

        self._acc_block = jax.jit(acc_block, donate_argnums=(0,))
        self._merge = jax.jit(merge)

    def _init_frame_sharded_smatrix(self, n_probes, prec, synth_chunk):
        """Frame-sharded S-matrix accumulation (round-4 item 4).

        Layout: each mesh frame row handles one frame per block. Within a
        row, the aperture BEAMS shard over the probe axis — every device
        propagates nb/Pk plane waves through its row's frame (the basis
        build is embarrassingly parallel, zero communication). Synthesis
        contracts the beam-sharded S rows against coefficient blocks with
        one local matmul + a ``psum_scatter`` over the probe axis, which
        simultaneously completes the beam contraction AND hands each device
        exactly its own probes' exit planes — the detector reduction then
        stays device-local. Communication per probe chunk: one
        (Pk*cl, npix) complex reduce-scatter over ICI, amortized by the
        (Pk*cl, nb/Pk, npix) matmul that precedes it.

        Probes pad to per-device chunk multiples; ``image()`` un-pads via
        ``self._probe_unpad``.
        """
        import functools as _ft
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..ops import matfft as _matfft
        from ..parallel.mesh import FRAME_AXIS, PROBE_AXIS
        from ..physics.potential import rasterize
        from ..physics.propagate import multislice
        from .smatrix import (_plane_waves, coefficient_phase,
                              window_starts_geom)

        mesh = self.mesh
        F = self._frame_extent
        Pk = int(mesh.shape[PROBE_AXIS])
        spec = self.spec
        g = spec.grid
        beams = self._beams
        f = beams.f
        nb = beams.n_beams
        intensity = self.intensity
        nx, ny = g.nx, g.ny
        npix = nx * ny
        wx, wy = nx // f, ny // f

        if n_probes % Pk:
            raise ValueError(
                f"n_probes={n_probes} must be divisible by the mesh probe "
                f"extent {Pk}")
        p_loc = n_probes // Pk
        cl = max(1, min(int(synth_chunk), p_loc))
        n_pc = -(-p_loc // cl)
        p_loc_pad = n_pc * cl
        p_pad = Pk * p_loc_pad

        # Beam chunking: chunk count divisible by Pk so the chunk axis
        # shards evenly over the probe axis.
        bc = max(1, min(self._beam_chunk, nb))
        n_chunks = -(-nb // bc)
        n_chunks = -(-n_chunks // Pk) * Pk
        chunk = -(-nb // n_chunks)
        nb_pad = n_chunks * chunk
        kxb = np.concatenate([beams.kxb, np.zeros(nb_pad - nb)])
        kyb = np.concatenate([beams.kyb, np.zeros(nb_pad - nb)])
        kb = np.stack([kxb.reshape(-1, chunk), kyb.reshape(-1, chunk)],
                      axis=1)                       # (n_chunks, 2, chunk)
        valid = (np.arange(nb_pad) < nb).astype(np.dtype(prec.real))

        # Padded-local probe layout: device i holds rows
        # [i*p_loc_pad, (i+1)*p_loc_pad); row l maps to global probe
        # i*p_loc + l for l < p_loc (pad rows repeat the last probe and
        # are discarded by image()).
        order = np.zeros((Pk, p_loc_pad), np.int64)
        for i in range(Pk):
            order[i, :p_loc] = np.arange(p_loc) + i * p_loc
            order[i, p_loc:] = order[i, p_loc - 1]
        self._probe_unpad = (
            (np.arange(n_probes) // p_loc) * p_loc_pad
            + (np.arange(n_probes) % p_loc))

        pos = self.probe_positions
        kw = self._sm_kwargs
        phase = coefficient_phase(beams, pos,
                                  aberrations=kw["aberrations"],
                                  defocus=kw["defocus"])
        phase = np.pad(phase, ((0, 0), (0, nb_pad - nb)))
        # (n_pc, Pk*cl, nb_pad): step t's synthesis rows = every device's
        # t-th local probe chunk, concatenated in device order (this is
        # exactly psum_scatter's tiled block order).
        phase_re = np.stack([
            phase[order[:, t * cl:(t + 1) * cl].reshape(-1)]
            for t in range(n_pc)]).astype(np.dtype(prec.real))
        if f > 1:
            sxa, sya = window_starts_geom(nx, ny, g.dx, g.dy, f, pos)
            sx_pad = sxa[order].reshape(-1).astype(np.int32)
            sy_pad = sya[order].reshape(-1).astype(np.int32)
        else:
            sx_pad = np.zeros(p_pad, np.int32)
            sy_pad = np.zeros(p_pad, np.int32)

        put = jax.device_put
        self._sm_inputs = (
            put(jnp.asarray(kb), NamedSharding(mesh, P(PROBE_AXIS))),
            put(jnp.asarray(phase_re),
                NamedSharding(mesh, P(None, None, PROBE_AXIS))),
            put(jnp.asarray(valid), NamedSharding(mesh, P(PROBE_AXIS))),
            put(jnp.asarray(self._sm_weights).reshape(-1),
                NamedSharding(mesh, P())),
            put(jnp.asarray(sx_pad), NamedSharding(mesh, P(PROBE_AXIS))),
            put(jnp.asarray(sy_pad), NamedSharding(mesh, P(PROBE_AXIS))),
        )
        self._acc = jax.jit(
            lambda: jnp.zeros((F, p_pad), prec.real),
            out_shardings=NamedSharding(mesh, P(FRAME_AXIS, PROBE_AXIS)))()

        kxs = np.fft.fftfreq(nx, d=g.dx)
        kys = np.fft.fftfreq(ny, d=g.dy)
        xs_r = jnp.asarray(np.asarray(g.xs), prec.real)
        ys_r = jnp.asarray(np.asarray(g.ys), prec.real)
        # f == 1 is the exactness contract (HIGHEST dots); f > 1 is the
        # PRISM approximation where window truncation dwarfs bf16 rounding
        # (same policy as smatrix._run_synth).
        dot_prec = (jax.lax.Precision.HIGHEST if f == 1
                    else jax.lax.Precision.DEFAULT)

        @_ft.partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(FRAME_AXIS, PROBE_AXIS), P(FRAME_AXIS),
                               P(PROBE_AXIS),
                               P(None, None, PROBE_AXIS), P(PROBE_AXIS),
                               P(), P(PROBE_AXIS), P(PROBE_AXIS)),
                     out_specs=P(FRAME_AXIS, PROBE_AXIS))
        def sm_block(acc_l, pos_row, kb_l, phase_l, valid_l, w, sx_l, sy_l):
            v = rasterize(pos_row[0].astype(prec.real), spec.plan, prec)

            def one_chunk(kpair):
                waves = _plane_waves(kpair[0].astype(prec.real),
                                     kpair[1].astype(prec.real),
                                     xs_r, ys_r, prec.complex)
                out = multislice(waves, v, kxs, kys, eV=beams.eV,
                                 dz=spec.dz, precision=prec,
                                 kmax2=spec.kmax2)
                if f == 1:
                    out = jnp.fft.fftshift(_matfft.fft2(out), axes=(-2, -1))
                return out

            s_loc = jax.lax.map(one_chunk, kb_l)     # (nc_loc, chunk, ...)
            s_flat = s_loc.reshape(-1, npix)         # (nb_loc, npix)
            cvalid = (valid_l / npix).astype(prec.real)

            def step(args):
                ph, sx_t, sy_t = args
                c = jax.lax.complex(jnp.cos(ph), jnp.sin(ph)).astype(
                    prec.complex) * cvalid[None, :]
                e = jnp.matmul(c, s_flat, precision=dot_prec)
                # Beam contraction completes AND each device receives its
                # own probes' rows in one collective.
                e = jax.lax.psum_scatter(e, PROBE_AXIS,
                                         scatter_dimension=0, tiled=True)
                if f > 1:
                    e = e.reshape(cl, nx, ny)
                    e = jnp.pad(e, ((0, 0), (0, wx), (0, wy)), mode="wrap")

                    def crop(wv, ax, ay):
                        return jax.lax.dynamic_slice(
                            wv, (ax, ay), (wx, wy)) * (f * f)
                    e = jax.vmap(crop)(e, sx_t, sy_t)
                    e = jnp.fft.fftshift(_matfft.fft2(e), axes=(-2, -1))
                    a = jnp.abs(e.reshape(cl, -1))
                else:
                    a = jnp.abs(e)
                if intensity:
                    a = a * a
                # f > 1 detector calibration: window k sums rescale by f^2
                # (smatrix_reduce's convention).
                return (a @ w) * (f * f)

            vals = jax.lax.map(step, (phase_l,
                                      sx_l.reshape(n_pc, cl),
                                      sy_l.reshape(n_pc, cl)))
            return acc_l + vals.reshape(1, p_loc_pad)

        @_ft.partial(jax.shard_map, mesh=mesh,
                     in_specs=(P(FRAME_AXIS, PROBE_AXIS),),
                     out_specs=P())
        def merge(acc):
            # fully replicated (multi-host-safe np.asarray in image())
            from ..parallel.sharded import _replicate_over_probe
            return _replicate_over_probe(
                jax.lax.psum(acc[0], FRAME_AXIS), p_pad)

        self._sm_block = jax.jit(sm_block, donate_argnums=(0,))
        self._merge = jax.jit(merge)

    def _track(self, frame_indices) -> None:
        if frame_indices is None:
            return
        idx = ([int(frame_indices)]
               if np.ndim(frame_indices) == 0 else
               [int(t) for t in frame_indices])
        dup = self._seen.intersection(idx)
        if dup or len(set(idx)) != len(idx):
            raise ValueError(
                f"frame indices fed more than once: {sorted(dup) or idx}")
        self._seen.update(idx)

    def add_frame(self, positions, frame_index=None) -> None:
        """Feed one frame. ``frame_index`` (optional) tracks which frames
        have been folded in, enabling checkpoint/resume bookkeeping —
        without it, resume relies on the frame COUNT alone."""
        if self._frame_extent > 1:
            raise ValueError(
                "this stream is frame-sharded (mesh frame extent "
                f"{self._frame_extent} > 1); feed frames through "
                "add_frame_block")
        self._track(frame_index)
        if self.use_smatrix:
            self._add_frame_smatrix(positions)
            return
        if self.probe_chunk is not None \
                and self.probe_chunk < self.probes.shape[0]:
            self._acc = _haadf_accumulate_chunked(
                self._acc, jnp.asarray(positions), self.probes,
                self._mask, self.spec, self.layer_index, self.intensity,
                int(self.probe_chunk))
            self._n += 1
            return
        self._acc = _haadf_accumulate(self._acc, jnp.asarray(positions),
                                      self.probes, self._mask, self.spec,
                                      self.layer_index, self.intensity)
        self._n += 1

    def _add_frame_smatrix(self, positions) -> None:
        """One frame through the S-matrix: basis build (beam-sharded over
        the mesh when one is given) + synthesis-reduction per probe —
        never materializes per-probe exit waves."""
        from .smatrix import compute_smatrix, smatrix_reduce
        g = self.spec.grid
        sm = compute_smatrix(positions, self.spec.plan, self._beams,
                             xs=g.xs, ys=g.ys, dz=self.spec.dz,
                             precision=self.spec.precision,
                             beam_chunk=self._beam_chunk, mesh=self.mesh,
                             kmax2=self.spec.kmax2)
        vals = smatrix_reduce(sm, self.probe_positions, self._sm_weights,
                              intensity=self.intensity,
                              precision=self.spec.precision,
                              **self._sm_kwargs)
        self._acc = self._acc + jnp.asarray(
            vals.astype(np.dtype(self.spec.precision.real)))
        self._n += 1

    def add_frame_block(self, positions_block, frame_indices=None) -> None:
        """Feed one frame per mesh frame-row: (F, n_atoms, 3).
        ``frame_indices``: optional F indices for resume bookkeeping."""
        F = self._frame_extent
        pos = jnp.asarray(positions_block)
        if F == 1:
            # single-device: ANY block size — one scan dispatch per block
            # (relay-latency amortization), probe-chunked streams included
            # (inner scan over the padded chunk axis). S-matrix streams
            # keep per-frame feeding (the basis build already batches the
            # heavy work).
            if pos.ndim != 3:
                raise ValueError(
                    f"positions_block must be (B, n_atoms, 3), "
                    f"got {pos.shape}")
            B = pos.shape[0]
            if frame_indices is not None and len(frame_indices) != B:
                raise ValueError(
                    f"frame_indices has {len(frame_indices)} entries for "
                    f"a {B}-frame block")
            if self.use_smatrix or B == 1:
                for k in range(B):
                    self.add_frame(pos[k], None if frame_indices is None
                                   else frame_indices[k])
                return
            # atomic: validate the WHOLE block before touching any state
            # (a per-frame loop would poison _seen for earlier indices
            # when a later one is a duplicate)
            self._track(frame_indices)
            # tail-pad to the established block size: one program per stream
            self._scan_block = max(getattr(self, "_scan_block", 0), B)
            pos_p, w = _pad_block(pos, [], self._scan_block)
            if (self.probe_chunk is not None
                    and self.probe_chunk < self.probes.shape[0]):
                self._acc = _haadf_accumulate_scan_chunked(
                    self._acc, pos_p, self.probes, self._mask, w,
                    self.spec, self.layer_index, self.intensity,
                    int(self.probe_chunk))
            else:
                self._acc = _haadf_accumulate_scan(
                    self._acc, pos_p, self.probes, self._mask, w, self.spec,
                    self.layer_index, self.intensity)
            self._n += B
            return
        if pos.ndim != 3 or pos.shape[0] != F:
            raise ValueError(f"positions_block must be ({F}, n_atoms, 3)")
        self._track(frame_indices)
        if self.use_smatrix:
            self._acc = self._sm_block(self._acc, pos, *self._sm_inputs)
        else:
            self._acc = self._acc_block(self._acc, pos, self.probes,
                                        self._mask)
        self._n += F

    # --- checkpoint / resume --------------------------------------------------
    #
    # Same sharded-file scheme as StreamingTACAW (round-2 missing #3: the
    # TACAW stream could kill-and-resume, its HAADF sibling could not).

    def checkpoint_key(self) -> str:
        import hashlib
        g = self.spec.grid
        mesh_shape = (tuple(sorted(self.mesh.shape.items()))
                      if self.mesh is not None else None)
        sm_cfg = ((self._beams.f, self._beams.mrad, self._beams.n_beams,
                   repr(self._sm_kwargs)) if self.use_smatrix else None)
        params = str((g.nx, g.ny, g.nz, self.spec.eV, self.spec.dz,
                      self.spec.record_layers, self.layer_index,
                      self.intensity,
                      (_digest_addressable(self.probes)
                       if self.probes is not None else "smatrix-only"),
                      _digest_addressable(self._mask),
                      _digest_addressable(self.probe_positions),
                      mesh_shape, self._frame_extent, sm_cfg))
        return hashlib.md5(params.encode()).hexdigest()[:12]

    def save_checkpoint(self, directory) -> None:
        """Accumulator + progress, one file per addressable shard (no
        global gather — multi-host-safe; see StreamingTACAW)."""
        from pathlib import Path
        d = Path(directory)
        d.mkdir(parents=True, exist_ok=True)
        _save_array_shards(d, "acc", self._acc)
        _write_manifest(d, {
            "key": self.checkpoint_key(),
            "n": int(self._n),
            "seen": sorted(int(t) for t in self._seen),
        })

    def restore(self, directory) -> set:
        """Load a checkpoint from an identically-configured stream on the
        same mesh topology; returns the frame indices already folded in
        (empty if the writer never passed ``frame_index`` — resume by
        count via ``n_streamed`` then). Raises ValueError on mismatch."""
        from pathlib import Path
        d = Path(directory)
        manifest = _read_manifest(d)
        if manifest["key"] != self.checkpoint_key():
            raise ValueError(
                "checkpoint config mismatch: the stream's parameters "
                f"(key {self.checkpoint_key()}) differ from the "
                f"checkpoint's (key {manifest['key']})")
        self._acc = _restore_array_shards(d, "acc", self._acc)
        self._n = int(manifest["n"])
        self._seen = set(int(t) for t in manifest.get("seen", []))
        return set(self._seen)

    @property
    def n_streamed(self) -> int:
        """Frames folded in so far (restored counts included)."""
        return self._n

    def image(self) -> np.ndarray:
        """(n_x, n_y) ADF image over the reconstructed scan grid."""
        if self._n == 0:
            raise ValueError("no frames streamed")
        acc = (self._merge(self._acc) if self._frame_extent > 1
               else self._acc)
        collected = np.asarray(acc)
        unpad = getattr(self, "_probe_unpad", None)
        if unpad is not None:
            collected = collected[unpad]   # drop synthesis pad rows
        collected = collected / self._n
        positions = self.probe_positions
        xs = np.array(sorted(set(positions[:, 0].tolist())))
        ys = np.array(sorted(set(positions[:, 1].tolist())))
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
        d2 = (np.sum(pts ** 2, axis=1)[:, None]
              - 2.0 * pts @ positions.T
              + np.sum(positions ** 2, axis=1)[None, :])
        nearest = np.argmin(d2, axis=1)
        return collected[nearest].reshape(len(xs), len(ys))

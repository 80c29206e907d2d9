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
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import wavelength as _wavelength
from .pipeline import SimSpec, frame_exit_waves


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
        """``mesh``: optional jax Mesh with a 'probe' axis — probes and
        accumulators are sharded over it and every per-frame accumulation
        runs probe-parallel with zero collectives (the potential rasterizes
        redundantly per device; propagation and accumulation are local).
        Incompatible with probe_chunk (sharding already bounds the per-
        device working set)."""
        self.spec = spec
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from ..parallel.mesh import PROBE_AXIS
            if probes.shape[0] % mesh.shape[PROBE_AXIS]:
                raise ValueError(
                    f"n_probes={probes.shape[0]} must be divisible by the "
                    f"mesh probe extent {mesh.shape[PROBE_AXIS]}")
            if probe_chunk is not None:
                raise ValueError("probe_chunk and mesh are mutually exclusive")
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

        def zeros(p):
            return jax.jit(lambda: (jnp.zeros((nb, p, nx, ny), prec.complex),
                                    jnp.zeros((p, nx, ny), prec.complex)
                                    if self._track_mean else
                                    jnp.zeros((), prec.complex)))()
        pairs = [zeros(sl.stop - sl.start) for sl in self._chunk_slices]
        self._acc_chunks = [a for a, _ in pairs]
        self._mean_chunks = ([m for _, m in pairs] if self._track_mean
                             else None)
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
        self._seen = 0

    @property
    def _acc(self):
        """Full accumulator view (concatenated over probe chunks)."""
        if len(self._acc_chunks) == 1:
            return self._acc_chunks[0]
        return jnp.concatenate(self._acc_chunks, axis=1)

    def _phases(self, t: int):
        # exp(-2*pi*i * f * t / n) for each selected bin f.
        phase = -2.0 * np.pi * self.bins.astype(np.float64) * t / self.n_frames
        prec = self.spec.precision
        re = np.cos(phase).astype(np.dtype(prec.real))
        im = np.sin(phase).astype(np.dtype(prec.real))
        return jax.jit(jax.lax.complex)(jnp.asarray(re), jnp.asarray(im))

    def add_frame(self, frame_index: int, positions) -> None:
        """Feed one MD frame (each index exactly once, any order).

        Probe chunking bounds the per-frame working set: each chunk's exit
        waves are computed and folded into the (donated, in-place)
        accumulator before the next chunk's propagation starts.
        """
        pos = jnp.asarray(positions)
        phases = self._phases(int(frame_index))
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
        self._seen += 1

    def intensity(self):
        """(n_selected, n_probes, nx, ny) real intensity (device array).

        Applies the mean-subtraction correction: only the f=0 bin is
        affected for integer bins (X0 - n*mean == 0 exactly).
        """
        if self._seen != self.n_frames:
            raise ValueError(
                f"streamed {self._seen} of {self.n_frames} frames")
        if not self._track_mean:
            chunks = [jax.jit(lambda a: jnp.abs(a) ** 2)(a)
                      for a in self._acc_chunks]
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

        @jax.jit
        def reduce(x):
            s = jnp.sum(x, axis=(2, 3))          # (n_sel, n_probes)
            return s
        s = np.asarray(reduce(inten))
        if probe_index is None:
            return s.mean(axis=1)
        return s[:, probe_index]


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


class StreamingHAADF:
    """Running ADF accumulation: mean over frames of the annular-masked
    k-space amplitude sum per probe (haadf_data.py:43-65 semantics)."""

    def __init__(self, spec: SimSpec, probes, probe_positions,
                 collection_angle: float = 45, eV: Optional[float] = None,
                 intensity: bool = False, layer_index: int = -1):
        self.spec = spec
        self.probes = probes
        self.probe_positions = np.asarray(probe_positions, dtype=np.float64)
        self.intensity = bool(intensity)
        n_layers = len(spec.record_layers) if spec.record_layers else 1
        self.layer_index = layer_index % n_layers

        lam = _wavelength(eV if eV is not None else spec.eV)
        # Reference-parity mask: built on the *nominal* (requested-sampling)
        # k axes (quirk #12).
        kxs = spec.grid.kxs_nominal_shifted()
        kys = spec.grid.kys_nominal_shifted()
        q = np.sqrt(kxs[:, None] ** 2 + kys[None, :] ** 2)
        radius = (collection_angle * 1e-3) / lam
        self._mask = jnp.asarray((q > radius).astype(
            np.dtype(spec.precision.real)))
        self._acc = jax.jit(lambda: jnp.zeros(
            (probes.shape[0],), spec.precision.real))()
        self._n = 0

    def add_frame(self, positions) -> None:
        self._acc = _haadf_accumulate(self._acc, jnp.asarray(positions),
                                      self.probes, self._mask, self.spec,
                                      self.layer_index, self.intensity)
        self._n += 1

    def image(self) -> np.ndarray:
        """(n_x, n_y) ADF image over the reconstructed scan grid."""
        if self._n == 0:
            raise ValueError("no frames streamed")
        collected = np.asarray(self._acc) / self._n
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

"""TACAW frequency-domain analysis.

Converts WFData (k-space exit waves over MD time) to phonon-resolved
intensity |Psi(omega, q)|^2 via an FFT along the *time* axis, then provides
the reference's six analysis methods with identical semantics
(/root/reference/src/postprocessing/tacaw_data.py:36-353):

* ``spectrum(probe_index=None)`` — sum over k; None averages over probes.
* ``spectrum_image(frequency, probe_indices=None)`` — one scalar per probe.
* ``diffraction(probe_index=None)`` — sum over frequency.
* ``spectral_diffraction(frequency, probe_index=None)`` — nearest-frequency slice.
* ``masked_spectrum(mask, probe_index=None)`` — k-mask then sum. (Fixes
  reference bug #5: the shape check now uses the axes that actually exist.)
* ``dispersion(kx_path, ky_path, probe_index=None)`` — nearest-neighbor
  k lookups -> (n_freq, n_k).

Design difference from the reference: composition instead of the dynamic
class-reparenting / shared-``__dict__`` hack (tacaw_data.py:38-43, bug #6) —
a TACAWData copies field references from the WFData but owns its own
namespace. The time FFT (the second-hottest kernel, SURVEY §3.3) runs
on-device via jnp, chunked over probes to bound HBM, with the mean-over-time
subtracted first to suppress the zero-frequency peak (tacaw_data.py:92-100).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import matfft

from .wf_data import WFData


@jax.jit
def _time_fft_block(re, im):
    """Mean-subtracted time FFT -> intensity for one probe block.

    Real inputs/outputs only: complex buffers cannot cross the host/device
    boundary on the target TPU runtime (see utils.host).
    """
    return _time_fft_block_c(jax.lax.complex(re, im))


@jax.jit
def _time_fft_block_c(blk):
    """Device-resident variant: complex block already on device."""
    blk = blk - jnp.mean(blk, axis=1, keepdims=True)
    fft = jnp.fft.fftshift(matfft.fft(blk, axis=1), axes=1)
    return jnp.abs(fft) ** 2


def time_fft_intensity(wf_layer, chunk_elems: int = 1 << 26):
    """|fftshift_t(fft_t(wf - mean_t(wf)))|^2 along axis 1 of a
    (probes, time, kx, ky) array, computed on device in probe chunks.

    A host (numpy) input is uploaded chunk-by-chunk and returns a host
    array; a device (jax) input stays device-resident end to end and
    returns a device array.
    """
    n_probes = wf_layer.shape[0]
    per_probe = int(np.prod(wf_layer.shape[1:]))
    chunk = max(1, int(chunk_elems // max(per_probe, 1)))
    if isinstance(wf_layer, jax.Array):
        if chunk >= n_probes:
            return _time_fft_block_c(wf_layer)
        return jnp.concatenate(
            [_time_fft_block_c(wf_layer[i:i + chunk])
             for i in range(0, n_probes, chunk)], axis=0)
    wf_layer = np.asarray(wf_layer)
    out = np.empty(wf_layer.shape, dtype=wf_layer.real.dtype)
    for i in range(0, n_probes, chunk):
        blk = wf_layer[i:i + chunk]
        out[i:i + chunk] = np.asarray(_time_fft_block(
            jnp.asarray(np.ascontiguousarray(blk.real)),
            jnp.asarray(np.ascontiguousarray(blk.imag))))
    return out


def _sharded_mesh(arr):
    """The ('frame', 'probe') Mesh an array is sharded over, or None —
    shared routing helper, canonical home parallel.sharded.sharded_mesh_of
    (HAADF/detectors/ptychography route through it too)."""
    from ..parallel.sharded import sharded_mesh_of
    return sharded_mesh_of(arr)


class TACAWData:
    """Frequency-domain TACAW dataset built from a WFData."""

    def __init__(self, wf_data: WFData, layer_index: Optional[int] = None):
        self.probe_positions = wf_data.probe_positions
        self.time = wf_data.time
        self.kxs = np.asarray(wf_data.kxs)
        self.kys = np.asarray(wf_data.kys)
        self.layer = wf_data.layer
        self.wavefunction_data = wf_data.wavefunction_data
        self.probe = wf_data.probe
        self.fft_from_wf_data(layer_index)

    # Aliases: the reference docstrings promise kx/ky while the converted
    # object carries kxs/kys (bug #5). Provide both names.
    @property
    def kx(self) -> np.ndarray:
        return self.kxs

    @property
    def ky(self) -> np.ndarray:
        return self.kys

    def fft_from_wf_data(self, layer_index: Optional[int] = None) -> None:
        """Time -> frequency conversion (tacaw_data.py:61-106).

        Frequencies are fftshift(fftfreq(n_t, dt)) in THz (time is in ps);
        intensity has shape (probes, frequency, kx, ky).
        """
        if layer_index is None:
            layer_index = len(self.layer) - 1
        if layer_index < 0 or layer_index >= len(self.layer):
            raise ValueError(
                f"layer_index {layer_index} out of range [0, {len(self.layer) - 1}]")

        n_freq = len(self.time)
        dt = self.time[1] - self.time[0]
        self.frequencies = np.fft.fftshift(np.fft.fftfreq(n_freq, d=dt))
        wf = self.wavefunction_data
        mesh = _sharded_mesh(wf)
        self._mesh = mesh
        if mesh is not None:
            # Mesh-sharded path (calculator.setup(mesh=...)): the frame-
            # sharded exit waves are resharded to kx stripes with an
            # all_to_all over ICI so the time FFT is device-local; the
            # intensity stays sharded P('probe', None, 'frame') and every
            # analysis method below reduces it INSIDE shard_map (psum over
            # the kx stripes / probe shards) — multi-host-safe: no eager
            # op ever touches a potentially non-addressable shard
            # (SURVEY §3.3's cross-frame dependency handled the TPU way).
            # The kx axis stays zero-PADDED to the mesh frame extent
            # internally; the public ``intensity`` property crops.
            from ..parallel.sharded import tacaw_intensity_sharded
            self._nx = wf.shape[2]
            self._intensity_full = tacaw_intensity_sharded(
                wf, mesh, layer_index=layer_index, crop=False)
        elif isinstance(wf, jax.Array):
            # Device-resident path (calculator.setup(device_output=True)):
            # the exit waves never visit the host; intensity stays a device
            # array and the analysis methods below reduce on device,
            # converting only their (small, real) results.
            self._intensity = time_fft_intensity(
                wf[:, :, :, :, layer_index])
        else:
            wf_layer = np.asarray(wf[:, :, :, :, layer_index])
            self._intensity = time_fft_intensity(wf_layer)

    @property
    def intensity(self) -> np.ndarray:
        """(probes, frequency, kx, ky) — the reference attribute. On a
        mesh-sharded run this crops the internal kx padding on access
        (single-controller only — multi-host analyses go through the
        methods, which reduce inside shard_map)."""
        if getattr(self, "_mesh", None) is not None:
            return self._intensity_full[:, :, :self._nx, :]
        return self._intensity

    @intensity.setter
    def intensity(self, value):
        self._mesh = None
        self._intensity = value

    def _probe_weights(self, probe_index: Optional[int]) -> np.ndarray:
        n = self._intensity_full.shape[0]
        if probe_index is None:
            return np.full(n, 1.0 / n, np.float32)
        w = np.zeros(n, np.float32)
        w[probe_index] = 1.0
        return w

    # --- analysis methods --------------------------------------------------
    #
    # Each reduces with the array module matching where intensity lives
    # (jnp on device, numpy on host; shard_map reductions on a mesh) and
    # returns a HOST numpy array — the reference API contract (spectrum()
    # etc. return host arrays, tacaw_data.py:119-143).

    def _xp(self):
        return jnp if isinstance(self.intensity, jax.Array) else np

    def _check_probe(self, probe_index: int) -> None:
        if probe_index >= len(self.probe_positions):
            raise ValueError(f"Probe index {probe_index} out of range")

    def spectrum(self, probe_index: Optional[int] = None) -> np.ndarray:
        """Sum over k-space -> (n_freq,). probe_index=None averages probes
        (tacaw_data.py:109-143)."""
        if self._mesh is not None:
            from ..parallel.sharded import tacaw_probe_spectra_sharded
            per = np.asarray(jax.device_get(tacaw_probe_spectra_sharded(
                self._intensity_full, self._mesh)))
            if probe_index is None:
                return per.mean(axis=0)
            self._check_probe(probe_index)
            return per[probe_index]
        xp = self._xp()
        if probe_index is None:
            return np.asarray(
                xp.mean(xp.sum(self.intensity, axis=(2, 3)), axis=0))
        self._check_probe(probe_index)
        return np.asarray(xp.sum(self.intensity[probe_index], axis=(1, 2)))

    def spectrum_image(self, frequency: float,
                       probe_indices: Optional[List[int]] = None) -> np.ndarray:
        """Real-space map: summed k intensity at the nearest frequency, one
        scalar per selected probe (tacaw_data.py:145-179)."""
        freq_idx = int(np.argmin(np.abs(self.frequencies - frequency)))
        if probe_indices is None:
            probe_indices = list(range(len(self.probe_positions)))
        if self._mesh is not None:
            from ..parallel.sharded import tacaw_probe_spectra_sharded
            per = np.asarray(jax.device_get(tacaw_probe_spectra_sharded(
                self._intensity_full, self._mesh)))
            return per[np.asarray(probe_indices), freq_idx]
        xp = self._xp()
        sel = self.intensity[np.asarray(probe_indices), freq_idx, :, :]
        return np.asarray(xp.sum(sel, axis=(1, 2)))

    def diffraction(self, probe_index: Optional[int] = None) -> np.ndarray:
        """Sum over frequency -> (kx, ky) (tacaw_data.py:183-217)."""
        if self._mesh is not None:
            from ..parallel.sharded import tacaw_kplane_sharded
            if probe_index is not None:
                self._check_probe(probe_index)
            plane = np.asarray(jax.device_get(tacaw_kplane_sharded(
                self._intensity_full, self._mesh,
                self._probe_weights(probe_index))))
            return plane[:self._nx]
        xp = self._xp()
        if probe_index is None:
            return np.asarray(
                xp.mean(xp.sum(self.intensity, axis=1), axis=0))
        self._check_probe(probe_index)
        return np.asarray(xp.sum(self.intensity[probe_index], axis=0))

    def spectral_diffraction(self, frequency: float,
                             probe_index: Optional[int] = None) -> np.ndarray:
        """Nearest-frequency (kx, ky) slice (tacaw_data.py:219-255)."""
        freq_idx = int(np.argmin(np.abs(self.frequencies - frequency)))
        if self._mesh is not None:
            from ..parallel.sharded import tacaw_kplane_sharded
            if probe_index is not None:
                self._check_probe(probe_index)
            plane = np.asarray(jax.device_get(tacaw_kplane_sharded(
                self._intensity_full, self._mesh,
                self._probe_weights(probe_index), freq_index=freq_idx)))
            return plane[:self._nx]
        xp = self._xp()
        if probe_index is None:
            return np.asarray(
                xp.mean(self.intensity[:, freq_idx, :, :], axis=0))
        self._check_probe(probe_index)
        return np.asarray(self.intensity[probe_index, freq_idx, :, :])

    def masked_spectrum(self, mask: np.ndarray,
                        probe_index: Optional[int] = None) -> np.ndarray:
        """Apply a (kx, ky) mask, then sum over k (tacaw_data.py:257-298)."""
        mask = np.asarray(mask)
        if mask.shape != (len(self.kxs), len(self.kys)):
            raise ValueError(
                f"Mask shape {mask.shape} doesn't match k-space shape "
                f"({len(self.kxs)}, {len(self.kys)})")
        if self._mesh is not None:
            from ..parallel.sharded import tacaw_probe_spectra_sharded
            pad = self._intensity_full.shape[2] - self._nx
            mask_p = np.pad(mask.astype(np.float32), ((0, pad), (0, 0)))
            per = np.asarray(jax.device_get(tacaw_probe_spectra_sharded(
                self._intensity_full, self._mesh, mask=mask_p)))
            if probe_index is None:
                return per.mean(axis=0)
            self._check_probe(probe_index)
            return per[probe_index]
        xp = self._xp()
        if probe_index is None:
            masked = self.intensity * mask[None, None, :, :]
            return np.asarray(xp.mean(xp.sum(masked, axis=(2, 3)), axis=0))
        self._check_probe(probe_index)
        masked = self.intensity[probe_index] * mask[None, :, :]
        return np.asarray(xp.sum(masked, axis=(1, 2)))

    def dispersion(self, kx_path: np.ndarray, ky_path: np.ndarray,
                   probe_index: Optional[int] = None) -> np.ndarray:
        """Intensity along a k path -> (n_freq, n_k) via nearest-neighbor
        k lookup (tacaw_data.py:301-353)."""
        kx_idx = np.argmin(
            np.abs(self.kxs[None, :] - np.asarray(kx_path)[:, None]), axis=1)
        ky_idx = np.argmin(
            np.abs(self.kys[None, :] - np.asarray(ky_path)[:, None]), axis=1)
        if self._mesh is not None:
            from ..parallel.sharded import tacaw_dispersion_sharded
            if probe_index is not None:
                self._check_probe(probe_index)
            return np.asarray(jax.device_get(tacaw_dispersion_sharded(
                self._intensity_full, self._mesh,
                self._probe_weights(probe_index), kx_idx, ky_idx)))
        xp = self._xp()
        if probe_index is None:
            picked = self.intensity[:, :, kx_idx, ky_idx]   # (p, f, k)
            return np.asarray(xp.mean(picked, axis=0))
        self._check_probe(probe_index)
        return np.asarray(self.intensity[probe_index][:, kx_idx, ky_idx])

"""Detector geometries and virtual imaging for 4D-STEM / CBED data.

The reference ships one hard-coded detector (HAADFData's annular mask,
/root/reference/src/postprocessing/haadf_data.py:47-50). The WFData layout
(probes, time, kx, ky, layer) already IS a 4D-STEM dataset — these helpers
add the standard detector geometries over it:

* ``annular_mask``    — bright field / ABF / ADF by (inner, outer) angles;
* ``segmented_mask``  — quadrant / DPC-style azimuthal segments;
* ``virtual_image``   — scan-grid image for any mask (generalizes
  HAADFData.calculateADF, sharing its nearest-probe reconstruction);
* ``center_of_mass``  — DPC center-of-mass deflection per scan point;
* ``bin_k``           — pixelated-detector downsampling of k-space;
* ``pacbed``          — position-averaged CBED (thickness fingerprint);
* ``radial_profile``  — azimuthal average of a diffraction pattern.

All reductions run on device when the WFData is device-resident
(calculator ``device_output=True``) and return host arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _k_grids(kxs, kys):
    kxs = np.asarray(kxs)
    kys = np.asarray(kys)
    return kxs[:, None], kys[None, :]


def _angle_to_k(mrad: float, lam: float) -> float:
    """Scattering semi-angle (mrad) -> |k| (1/Angstrom), as the reference
    converts its collection angle (haadf_data.py:49)."""
    return (mrad * 1e-3) / lam


def annular_mask(kxs, kys, lam: float, inner_mrad: float = 0.0,
                 outer_mrad: Optional[float] = None,
                 ksq=None) -> np.ndarray:
    """(nx, ny) float mask for inner <= theta < outer (mrad).

    inner=0 gives a disk (bright field); outer=None extends to the grid
    corner (the reference's ADF is inner_mrad=collection_angle, outer=None).
    ``ksq``: optional |k|^2 grid (e.g. WFData.ksq_shifted for oblique
    cells) overriding the separable kxs^2 + kys^2.
    """
    if ksq is not None:
        q = np.sqrt(np.asarray(ksq))
    else:
        kx, ky = _k_grids(kxs, kys)
        q = np.sqrt(kx ** 2 + ky ** 2)
    if inner_mrad > 0:
        mask = q > _angle_to_k(inner_mrad, lam)   # strict >, haadf_data.py:50
    else:
        mask = np.ones_like(q, dtype=bool)
    if outer_mrad is not None:
        mask = mask & (q <= _angle_to_k(outer_mrad, lam))
    return mask.astype(np.float64)


def segmented_mask(kxs, kys, lam: float, inner_mrad: float,
                   outer_mrad: float, n_segments: int = 4,
                   rotation_deg: float = 0.0) -> np.ndarray:
    """(n_segments, nx, ny) azimuthal segments of an annulus (DPC / first-
    moment detectors). Segment s covers azimuth [s, s+1) * 2pi/n (+rotation)."""
    kx, ky = _k_grids(kxs, kys)
    ring = annular_mask(kxs, kys, lam, inner_mrad, outer_mrad)
    phi = (np.arctan2(ky, kx) - np.deg2rad(rotation_deg)) % (2 * np.pi)
    edges = np.linspace(0.0, 2 * np.pi, n_segments + 1)
    segs = [(ring * ((phi >= edges[s]) & (phi < edges[s + 1])))
            for s in range(n_segments)]
    return np.stack(segs, axis=0)


def _collected(wf_data, mask, intensity: bool, layer_index: int = -1):
    """Per-(probe, segment) mean-over-frames masked k sum; device- and
    mesh-aware (sharded WFData reduces through shard_map — multi-host
    safe)."""
    wf = wf_data.wavefunction_data
    from ..parallel.sharded import collected_sharded, sharded_mesh_of
    mesh = sharded_mesh_of(wf)
    if mesh is not None:
        return np.asarray(jax.device_get(collected_sharded(
            wf, mesh, mask, layer_index=layer_index, intensity=intensity)))
    xp = jnp if isinstance(wf, jax.Array) else np
    exits = xp.abs(wf[:, :, :, :, layer_index])
    if intensity:
        exits = exits ** 2
    m = xp.asarray(mask)
    if m.ndim == 2:
        m = m[None]
    # Contract k per segment WITHOUT materializing the (P, T, S, nx, ny)
    # broadcast (n_segments x the dataset in memory): one einsum, then the
    # frame mean.
    out = xp.einsum("ptxy,sxy->ps", exits, m) / exits.shape[1]
    return np.asarray(out)


def _scan_axes(probe_positions):
    """Unique sorted scan axes (the HAADFData.calculateADF reconstruction
    convention); shared by detectors, engine.smatrix and engine.coherence."""
    positions = np.asarray(probe_positions, dtype=np.float64)
    xs = np.array(sorted(set(positions[:, 0].tolist())))
    ys = np.array(sorted(set(positions[:, 1].tolist())))
    return positions, xs, ys


def _scan_grid(probe_positions):
    positions, xs, ys = _scan_axes(probe_positions)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    d2 = (np.sum(pts ** 2, axis=1)[:, None] - 2.0 * pts @ positions.T
          + np.sum(positions ** 2, axis=1)[None, :])
    nearest = np.argmin(d2, axis=1)
    return xs, ys, nearest


def virtual_image(wf_data, mask, intensity: bool = True,
                  layer_index: int = -1) -> np.ndarray:
    """Scan-grid image(s) for an arbitrary detector mask.

    mask: (nx, ny) -> returns (n_x, n_y); (n_seg, nx, ny) -> returns
    (n_seg, n_x, n_y). Scan-grid reconstruction matches
    HAADFData.calculateADF (nearest probe per unique-x/unique-y point).
    """
    mask = np.asarray(mask)
    squeeze = mask.ndim == 2
    collected = _collected(wf_data, mask, intensity, layer_index)
    xs, ys, nearest = _scan_grid(wf_data.probe_positions)
    img = collected[nearest].reshape(len(xs), len(ys), -1)
    img = np.moveaxis(img, -1, 0)
    return img[0] if squeeze else img


def center_of_mass(wf_data, layer_index: int = -1) -> np.ndarray:
    """DPC center-of-mass deflection <k> per scan point: (2, n_x, n_y)
    (kx and ky first moments of the frame-averaged intensity)."""
    wf = wf_data.wavefunction_data
    kx1 = np.asarray(wf_data.kxs, dtype=np.float64)
    ky1 = np.asarray(wf_data.kys, dtype=np.float64)
    from ..parallel.sharded import collected_sharded, sharded_mesh_of
    mesh = sharded_mesh_of(wf)
    if mesh is not None:
        # Three weight planes (1, kx, ky) give the zeroth + first moments
        # in one multi-host-safe shard_map reduction.
        nx, ny = wf.shape[2], wf.shape[3]
        weights = np.stack([np.ones((nx, ny)),
                            np.broadcast_to(kx1[:, None], (nx, ny)),
                            np.broadcast_to(ky1[None, :], (nx, ny))])
        col = np.asarray(jax.device_get(collected_sharded(
            wf, mesh, weights, layer_index=layer_index, intensity=True)))
        com = np.stack([col[:, 1] / col[:, 0], col[:, 2] / col[:, 0]])
    else:
        xp = jnp if isinstance(wf, jax.Array) else np
        inten = xp.mean(xp.abs(wf[:, :, :, :, layer_index]) ** 2, axis=1)
        kx = xp.asarray(kx1)
        ky = xp.asarray(ky1)
        total = xp.sum(inten, axis=(1, 2))
        comx = xp.sum(inten * kx[None, :, None], axis=(1, 2)) / total
        comy = xp.sum(inten * ky[None, None, :], axis=(1, 2)) / total
        com = np.stack([np.asarray(comx), np.asarray(comy)], axis=0)
    xs, ys, nearest = _scan_grid(wf_data.probe_positions)
    return com[:, nearest].reshape(2, len(xs), len(ys))


def bin_k(array, factor: int):
    """Pixelated-detector binning: sum k-space in (factor x factor) blocks
    over the last two axes (trailing remainders are cropped, as real
    detectors crop to their pixel grid)."""
    array = np.asarray(array)
    nx, ny = array.shape[-2:]
    bx, by = nx // factor, ny // factor
    a = array[..., :bx * factor, :by * factor]
    a = a.reshape(*array.shape[:-2], bx, factor, by, factor)
    return a.sum(axis=(-3, -1))


def apply_shot_noise(image, dose: float, pixel_area: float = 1.0,
                     seed: int = 0):
    """Finite-dose (shot-noise) detector model.

    The noiseless simulation corresponds to infinite dose; real detectors
    count electrons. Each pixel is Poisson-sampled with expectation

        lam = image * dose * pixel_area

    where ``image`` is a detected-fraction-of-beam intensity map (e.g. a
    ``virtual_image(..., intensity=True)`` of a unit-norm probe — its
    values are the fraction of incident electrons the detector collects
    at that scan position), ``dose`` is incident electrons per A^2, and
    ``pixel_area`` the scan-pixel area in A^2 (dose * pixel_area =
    electrons delivered per scan position). Returns electron counts as a
    float numpy array; reproducible via ``seed``
    (jax.random.poisson on device).
    """
    import jax.random
    img = jnp.asarray(np.asarray(image, np.float64), jnp.float32)
    lam = img * (dose * pixel_area)
    key = jax.random.PRNGKey(seed)
    counts = jax.random.poisson(key, lam).astype(jnp.float32)
    return np.asarray(counts)


def pacbed(wf_data, layer_index: int = -1, probe_indices=None
           ) -> np.ndarray:
    """Position-averaged CBED: the mean diffraction intensity over scan
    positions (and frames) — (nx, ny) fftshifted. PACBED patterns are the
    standard fingerprint for thickness/tilt determination (LeBeau et al.,
    Ultramicroscopy 110, 2010). ``probe_indices`` restricts the average
    to a subset of scan positions (e.g. one unit cell)."""
    wf = wf_data.wavefunction_data
    from ..parallel.sharded import (frame_mean_intensity_sharded,
                                    sharded_mesh_of)
    mesh = sharded_mesh_of(wf)
    if mesh is not None:
        # Multi-host-safe: per-probe frame means come back replicated;
        # the (optionally subset) probe average happens on the host.
        per_probe = np.asarray(jax.device_get(
            frame_mean_intensity_sharded(wf, mesh, layer_index=layer_index)))
        if probe_indices is not None:
            per_probe = per_probe[np.asarray(probe_indices, dtype=np.int64)]
        return per_probe.mean(axis=0)
    xp = jnp if isinstance(wf, jax.Array) else np
    w = wf[..., layer_index]
    if probe_indices is not None:
        w = w[np.asarray(probe_indices, dtype=np.int64)]
    inten = xp.mean(xp.abs(w) ** 2, axis=(0, 1))
    return np.asarray(inten)


def radial_profile(pattern, kxs, kys, n_bins: int = 128,
                   kmax: Optional[float] = None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Azimuthal average of a diffraction pattern.

    pattern: (..., nx, ny) on the fftshifted detector grid (kxs, kys in
    1/Angstrom, monotonic). Returns (k_centers (n_bins,), profile
    (..., n_bins)) where profile[b] is the MEAN intensity over pixels
    with k in bin b (empty bins give 0). ``kmax`` bounds the profiled
    radius (default: the largest inscribed circle, min-axis Nyquist —
    beyond it rings are incomplete and the mean biases)."""
    pattern = np.asarray(pattern)
    kx, ky = _k_grids(kxs, kys)
    q = np.sqrt(kx ** 2 + ky ** 2)
    if kmax is None:
        kmax = min(float(np.max(np.abs(np.asarray(kxs)))),
                   float(np.max(np.abs(np.asarray(kys)))))
    if kmax <= 0:
        raise ValueError(f"kmax must be positive, got {kmax}")
    idx = np.floor(q / kmax * n_bins).astype(np.int64)
    inside = (idx < n_bins).ravel()
    idx = np.clip(idx.ravel(), 0, n_bins - 1)
    counts = np.bincount(idx[inside], minlength=n_bins)
    flat = pattern.reshape(-1, pattern.shape[-2] * pattern.shape[-1])
    sums = np.stack([np.bincount(idx[inside], weights=row[inside],
                                 minlength=n_bins) for row in flat])
    prof = sums / np.maximum(counts, 1)[None, :]
    centers = (np.arange(n_bins) + 0.5) * (kmax / n_bins)
    return centers, prof.reshape(*pattern.shape[:-2], n_bins)


def apply_detector_mtf(pattern, *, a: float = 0.1, c: float = 0.5,
                       order: float = 2.0, mtf=None):
    """Detector modulation-transfer-function blur on recorded pattern(s).

    Real pixelated detectors spread each electron's charge over
    neighboring pixels; the recorded pattern is the true one convolved
    with the pixel point-spread function — a multiplication by the MTF in
    the pattern's Fourier domain. The default parametric form is the
    standard soft-Lorentzian fit used for direct detectors
    (e.g. Kirkland App. A; abTEM's detector model):

        MTF(w) = (1 - a) / (1 + (w / c)**order) + a

    with ``w`` the spatial frequency in units of the detector NYQUIST
    (w = 1 at one cycle per two pixels), ``c`` the half-falloff
    frequency, and ``a`` the high-frequency floor (charge that stays in
    one pixel). Pass ``mtf`` (a callable w -> response, vectorized) to
    override the form entirely.

    Apply AFTER shot noise for the physical pipeline (each counted
    electron's charge spreads): ``apply_detector_mtf(apply_shot_noise(
    I, dose))``. Works on any (..., nkx, nky) stack; returns float64
    numpy. Energy (the pattern sum) is conserved exactly: MTF(0) = 1.
    """
    pat = np.asarray(pattern, dtype=np.float64)
    nkx, nky = pat.shape[-2:]
    wx = np.abs(np.fft.fftfreq(nkx)) * 2.0        # 1.0 at Nyquist
    wy = np.abs(np.fft.fftfreq(nky)) * 2.0
    w = np.sqrt(wx[:, None] ** 2 + wy[None, :] ** 2)
    if mtf is None:
        if not 0.0 <= a < 1.0:
            raise ValueError(f"MTF floor a must be in [0, 1), got {a}")
        if c <= 0.0:
            raise ValueError(f"MTF falloff c must be > 0, got {c}")
        if order <= 0.0:
            raise ValueError(f"MTF order must be > 0, got {order} "
                             "(non-positive orders break MTF(0) = 1, the "
                             "energy-conservation guarantee)")
        resp = (1.0 - a) / (1.0 + (w / c) ** order) + a
    else:
        resp = np.asarray(mtf(w), dtype=np.float64)
        if resp.shape != w.shape:
            raise ValueError("mtf(w) must return an array of w's shape")
    blurred = np.fft.ifft2(np.fft.fft2(pat, axes=(-2, -1)) * resp,
                           axes=(-2, -1)).real
    return blurred

"""HRTEM / conventional-TEM image formation (beyond-reference).

The reference covers probe-side modes only (STEM/TACAW/diffraction —
/root/reference/src/multislice/multislice.py, haadf_data.py); it has no
imaging-side optics. In CTEM the illumination is a plane wave and the
OBJECTIVE lens after the specimen forms a real-space image: aberrations
act on the exit wave, not on the probe,

    psi_img = ifft2( fft2(psi_exit) * A(k) * exp(-i chi(k)) ),
    I(r)    = |psi_img|^2,

with chi the Krivanek/Kirkland aberration phase already used probe-side
(physics.aberrations.chi_phase) and A(k) the objective aperture.

Partial coherence (all mechanisms are incoherent — they average image
INTENSITIES — so they compose):

* temporal (chromatic): Gauss-Hermite quadrature over the defocus spread
  delta = Cc dE/E (engine.coherence.defocus_series). Because the lens
  acts AFTER propagation, each node costs one FFT pair on the already
  computed exit wave — unlike STEM, where each defocus re-runs the
  multislice. The quadrature is exact where the common quasi-coherent
  "temporal envelope" is a linear-imaging approximation.
* spatial (finite illumination convergence): incoherent average over
  incident-beam tilts, Gaussian with 1/e half-angle ``beam_semiangle``
  (mrad), sampled by a tensor Gauss-Hermite grid. Each tilt is an exact
  multislice run with a tilted plane wave exp(2 pi i k_t . r); the tilt
  batch rides the probe axis of the fused kernels (one batched dispatch
  per slice, MXU-friendly), so n_tilts^2 waves cost one STEM-batch run.
* thermal: frozen-phonon configurations (engine.thermal.thermal_configs),
  or the MD trajectory's own frames with ``n_configs=0``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import get_precision
from ..data.trajectory import Trajectory
from ..physics.aberrations import Aberrations, chi_phase
from ..utils.host import device_zeros


def objective_transfer(kxs, kys, *, lam: float,
                       ab: Optional[Aberrations] = None,
                       aperture: Optional[float] = None,
                       ksq=None, precision=None) -> np.ndarray:
    """Objective-lens transfer function H(k) = A(k) exp(-i chi(k)) on the
    fftfreq-ordered (nx, ny) grid.

    ``aperture``: objective aperture semi-angle in mrad (None = open).
    ``ksq``: optional |k|^2 grid for oblique cells (isotropic aberrations
    only, same contract as physics.aberrations).
    """
    prec = get_precision(precision)
    rdt = np.dtype(prec.real)
    ab = ab if ab is not None else Aberrations()
    if ksq is not None:
        q2 = np.asarray(ksq, dtype=rdt)
        chi = chi_phase(q2, lam=lam, ab=ab) if not ab.is_zero() else \
            np.zeros_like(q2)
    else:
        kx = np.asarray(kxs, dtype=rdt)[:, None]
        ky = np.asarray(kys, dtype=rdt)[None, :]
        q2 = kx * kx + ky * ky
        if ab.is_zero():
            chi = np.zeros(q2.shape, dtype=rdt)
        elif ab.is_isotropic():
            chi = chi_phase(q2, lam=lam, ab=ab)
        else:
            kxg, kyg = np.broadcast_arrays(kx, ky)
            chi = np.asarray(chi_phase(q2, kxg, kyg, lam=lam, ab=ab))
    transfer = np.exp(-1j * chi.astype(np.float64)).astype(prec.complex)
    if aperture is not None:
        k_max = (float(aperture) * 1e-3) / lam
        transfer = transfer * (q2 <= k_max * k_max).astype(prec.complex)
    return transfer


@jax.jit
def _ctf_images(kwaves, h_re, h_im):
    """|ifft2(kwaves * H)|^2 — kwaves (..., nx, ny) unshifted k-space.
    H arrives as two REAL planes (complex buffers cannot cross the
    host<->device boundary on the axon TPU relay — utils.host)."""
    transfer = jax.lax.complex(h_re, h_im)
    return jnp.abs(jnp.fft.ifft2(kwaves * transfer)) ** 2


def _transfer_planes(transfer: np.ndarray, prec):
    """Host complex H -> device (re, im) real planes."""
    rdt = np.dtype(prec.real)
    return (jnp.asarray(np.ascontiguousarray(transfer.real, dtype=rdt)),
            jnp.asarray(np.ascontiguousarray(transfer.imag, dtype=rdt)))


def image_from_exit_wave(exit_wave, kxs, kys, *, lam: float,
                         ab: Optional[Aberrations] = None,
                         aperture: Optional[float] = None,
                         input_space: str = "real",
                         ksq=None, precision=None) -> jnp.ndarray:
    """HRTEM image intensity from an exit wave (batch dims broadcast).

    ``input_space``: "real" (default, real-space psi), "k" (fftfreq-order
    k-space), or "k_shifted" (fftshifted k-space — the WFData /
    frame_exit_waves layout, calculators.py:285-287 semantics)."""
    from ..utils.host import put_complex_or_real
    prec = get_precision(precision)
    wave = put_complex_or_real(exit_wave, prec.complex)
    if input_space == "real":
        kw = jnp.fft.fft2(wave)
    elif input_space == "k":
        kw = wave
    elif input_space == "k_shifted":
        kw = jnp.fft.ifftshift(wave, axes=(-2, -1))
    else:
        raise ValueError(
            f"input_space must be 'real', 'k' or 'k_shifted', "
            f"got {input_space!r}")
    transfer = objective_transfer(kxs, kys, lam=lam, ab=ab,
                                  aperture=aperture, ksq=ksq,
                                  precision=prec)
    return _ctf_images(kw, *_transfer_planes(transfer, prec))


def focal_series(exit_wave, defoci, kxs, kys, *, lam: float,
                 ab: Optional[Aberrations] = None,
                 aperture: Optional[float] = None,
                 input_space: str = "real",
                 ksq=None, precision=None) -> jnp.ndarray:
    """Through-focal series of HRTEM images from ONE exit wave.

    ``defoci`` (N,) are added to ``ab.C1`` per plane; all N lens states
    act on the same (nx, ny) exit wave as a single batched FFT dispatch.
    Returns (N, nx, ny) image intensities (device array). This is the
    forward model inverted by analysis.ewr.iwfr_reconstruct.
    """
    from ..utils.host import put_complex_or_real
    prec = get_precision(precision)
    wave = put_complex_or_real(np.asarray(exit_wave), prec.complex)
    if wave.ndim != 2:
        raise ValueError(f"exit_wave must be 2-D, got {wave.shape}")
    if input_space == "real":
        kw = jnp.fft.fft2(wave)
    elif input_space == "k":
        kw = wave
    elif input_space == "k_shifted":
        kw = jnp.fft.ifftshift(wave, axes=(-2, -1))
    else:
        raise ValueError(
            f"input_space must be 'real', 'k' or 'k_shifted', "
            f"got {input_space!r}")
    base = ab if ab is not None else Aberrations()
    planes = [_transfer_planes(objective_transfer(
        kxs, kys, lam=lam,
        ab=dataclasses.replace(base, C1=base.C1 + float(d)),
        aperture=aperture, ksq=ksq, precision=prec), prec)
        for d in np.asarray(defoci, dtype=np.float64).ravel()]
    h_re = jnp.stack([p[0] for p in planes])
    h_im = jnp.stack([p[1] for p in planes])
    return _ctf_images(kw[None, :, :], h_re, h_im)


def _tilt_series(beam_semiangle: float, n_tilts: int, lam: float
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """(tilts (m, 2) in 1/Angstrom, weights (m,)) for a Gaussian
    illumination-convergence distribution with 1/e half-angle
    ``beam_semiangle`` (mrad), tensor Gauss-Hermite sampling."""
    if beam_semiangle <= 0:
        return np.zeros((1, 2)), np.ones(1)
    if n_tilts <= 1:
        raise ValueError(
            f"beam_semiangle={beam_semiangle} mrad requests partial "
            f"spatial coherence but n_tilts={n_tilts} collapses the "
            "illumination cone to a single axial plane wave — the result "
            "would be the fully coherent image. Use n_tilts >= 2 (5-9 is "
            "typical), or beam_semiangle=0 for a coherent simulation.")
    x, w = np.polynomial.hermite.hermgauss(int(n_tilts))
    theta = (beam_semiangle * 1e-3) * x          # radians
    w = w / np.sqrt(np.pi)
    kt = theta / lam                              # 1/Angstrom
    tx, ty = np.meshgrid(kt, kt, indexing="ij")
    wx, wy = np.meshgrid(w, w, indexing="ij")
    return (np.stack([tx.ravel(), ty.ravel()], axis=1),
            (wx * wy).ravel())


def hrtem_image(trajectory: Trajectory,
                *,
                voltage_eV: float = 100e3,
                aberrations: Optional[Aberrations] = None,
                defocus: float = 0.0,
                objective_aperture: Optional[float] = None,
                Cc: float = 0.0,
                dE: float = 0.0,
                n_nodes: int = 7,
                beam_semiangle: float = 0.0,
                n_tilts: int = 5,
                n_configs: int = 8,
                thermal_sigma: float = 0.1,
                seed: Optional[int] = 0,
                sampling: float = 0.1,
                slice_thickness: float = 0.5,
                fast_grid: bool = False,
                distribution: str = "gaussian",
                bandwidth_limit: Optional[float] = None
                ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partially coherent HRTEM image in one call.

    Plane-wave (optionally tilt-sampled) multislice exit waves per thermal
    configuration -> objective CTF at each chromatic defocus node ->
    weighted incoherent intensity average. Returns
    (image (nx, ny) real, xs, ys) — real-space axes in Angstrom.

    * ``aberrations`` + ``defocus``: lens state; ``defocus`` adds to C1
      (e.g. Scherzer: ``Aberrations(C3=Cs).scherzer_defocus(lam)``).
    * ``objective_aperture``: semi-angle in mrad (None = open lens).
    * ``Cc``/``dE``: chromatic aberration (Angstrom) and energy spread
      (eV, FWHM) -> defocus quadrature over delta = Cc dE/E.
    * ``beam_semiangle``/``n_tilts``: spatial coherence — Gaussian
      illumination cone (1/e half-angle, mrad) sampled by an
      n_tilts x n_tilts Gauss-Hermite tilt grid run as ONE probe batch.
    * ``n_configs``: frozen-phonon ensemble size; ``0`` uses the MD
      trajectory's own frames (TACAW-style input).
    """
    from ..core.constants import wavelength
    from ..core.grids import grid_from_trajectory
    from ..physics.potential import make_plan
    from .coherence import defocus_series, defocus_spread
    from .pipeline import SimSpec, frame_exit_waves
    from .thermal import thermal_configs

    ab = aberrations if aberrations is not None else Aberrations()
    if defocus:
        ab = dataclasses.replace(ab, C1=ab.C1 + float(defocus))
    lam = wavelength(voltage_eV)

    if n_configs and n_configs > 0:
        configs = thermal_configs(trajectory, n_configs, thermal_sigma,
                                  seed, distribution)
    else:
        configs = trajectory
    n_cfg = configs.n_frames

    grid = grid_from_trajectory(trajectory, sampling=sampling,
                                slice_thickness=slice_thickness,
                                fast_grid=fast_grid)
    oblique = grid.is_oblique
    if oblique and beam_semiangle > 0:
        raise ValueError(
            "beam-tilt sampling needs a Cartesian real-space grid; on "
            "oblique cells run with beam_semiangle=0")
    plan = make_plan(grid.xs, grid.ys, grid.zs, configs.positions,
                     configs.atom_types,
                     cell2d=grid.cell2d if oblique else None)
    spec = SimSpec.create(grid, plan, voltage_eV,
                          bandwidth_limit=bandwidth_limit)
    prec = spec.precision

    tilts, tilt_w = _tilt_series(beam_semiangle, n_tilts, lam)
    if tilts.shape[0] == 1:
        waves = np.ones((1, grid.nx, grid.ny), dtype=prec.complex)
    else:
        # Snap each tilt to the supercell's reciprocal lattice: an off-grid
        # exp(2 pi i k_t . r) is discontinuous across the periodic boundary
        # and the wrap artifacts swamp the image (standard multislice
        # practice — tilts quantize to 1/L). A cell much smaller than
        # lam/beta therefore collapses all tilts to zero; use a larger
        # supercell (Trajectory.tile_positions) for spatial-coherence runs.
        tilts = tilts.copy()
        tilts[:, 0] = np.round(tilts[:, 0] * grid.lx) / grid.lx
        tilts[:, 1] = np.round(tilts[:, 1] * grid.ly) / grid.ly
        x = np.asarray(grid.xs)[:, None]
        y = np.asarray(grid.ys)[None, :]
        phase = (2j * np.pi) * (tilts[:, 0, None, None] * x[None]
                                + tilts[:, 1, None, None] * y[None])
        waves = np.exp(phase).astype(prec.complex)

    delta = defocus_spread(Cc, dE, voltage_eV) if (Cc and dE) else 0.0
    nodes, node_w = defocus_series(delta, n=n_nodes, center=0.0)
    transfers = [
        _transfer_planes(objective_transfer(
            spec.plan.kxs, spec.plan.kys, lam=lam,
            ab=dataclasses.replace(ab, C1=ab.C1 + float(d)),
            aperture=objective_aperture,
            ksq=spec.ksq2d, precision=prec), prec)
        for d in nodes]
    tilt_w_dev = jnp.asarray(tilt_w.astype(np.dtype(prec.real)))

    @jax.jit
    def accumulate(acc, kw, h_re, h_im, w):
        imgs = _ctf_images(kw, h_re, h_im)        # (tilts, nx, ny)
        return acc + w * jnp.einsum("p,pxy->xy", tilt_w_dev, imgs)

    acc = device_zeros((grid.nx, grid.ny), prec.real)
    from ..utils.host import to_device_complex
    probes = to_device_complex(waves, prec.complex)
    for c in range(n_cfg):
        kw = frame_exit_waves(jnp.asarray(configs.positions[c]), probes,
                              spec)[..., -1]      # fftshifted k-space
        kw = jnp.fft.ifftshift(kw, axes=(-2, -1))
        for (h_re, h_im), w in zip(transfers, node_w):
            acc = accumulate(acc, kw, h_re, h_im, float(w) / n_cfg)
    return np.asarray(acc), np.asarray(grid.xs), np.asarray(grid.ys)

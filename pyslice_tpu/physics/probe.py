"""Electron probe wavefunctions.

TPU-native design: a functional core (``probe_array``, ``defocus``,
``shift_probes``) of pure jittable functions over explicit arrays, plus a thin
``Probe`` class facade matching the reference API surface
(/root/reference/src/multislice/multislice.py:44-235).

Physics (see /root/reference/math.txt:41-47):
* plane wave (mrad == 0): uniform unit amplitude (multislice.py:112-113);
* convergent beam: circular aperture mask of radius (mrad*1e-3)/lambda in
  k-space, probe = ifftshift(ifft2(mask)) — an Airy disk (multislice.py:114-124);
* defocus: multiply (dz > 0) or divide (dz < 0) by the Fresnel kernel in
  k-space (multislice.py:183-190);
* probe positioning: k-space phase ramp exp(2*pi*i k . r0) — sub-pixel shifts,
  vmapped over positions instead of the reference's Python loop
  (multislice.py:198-235).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import wavelength as _wavelength
from ..core.dtypes import get_precision
from ..utils.host import put_complex_or_real, to_numpy


# --- functional core ---------------------------------------------------------
#
# Transfer discipline: complex buffers never cross the host/device boundary
# (see utils.host) — every builder here takes real host inputs and forms
# complex values inside compiled code.


@jax.jit
def _complex_from_phase(phase):
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


@functools.partial(jax.jit, static_argnames=("complex_dtype",))
def _aperture_probe(mask_real, complex_dtype):
    mask = jax.lax.complex(mask_real, jnp.zeros_like(mask_real)).astype(complex_dtype)
    return jnp.fft.ifftshift(jnp.fft.ifft2(mask))


def probe_array(xs, ys, mrad: float, eV: float, precision=None,
                ksq=None) -> jnp.ndarray:
    """Build the base probe wavefunction, shape (nx, ny) complex.

    mrad == 0 gives a plane wave of ones; otherwise a hard circular aperture
    of radius (mrad*1e-3)/lambda(eV) in reciprocal space, inverse-transformed
    and ifftshifted to center the probe (multislice.py:112-124).
    ``ksq``: optional (nx, ny) |k|^2 (fftfreq order) for oblique cells.
    """
    prec = get_precision(precision)
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    nx, ny = len(xs), len(ys)
    if mrad == 0:
        # jit so the complex constant is materialized on device, never
        # transferred (see utils.host transfer discipline).
        return jax.jit(lambda: jnp.ones((nx, ny), dtype=prec.complex))()
    lam = _wavelength(eV)
    radius = (mrad * 1e-3) / lam
    if ksq is not None:
        radii = np.sqrt(np.asarray(ksq))
    else:
        kxs = np.fft.fftfreq(nx, d=xs[1] - xs[0])
        kys = np.fft.fftfreq(ny, d=ys[1] - ys[0])
        radii = np.sqrt(kxs[:, None] ** 2 + kys[None, :] ** 2)
    mask = np.asarray(radii < radius, dtype=np.float64).astype(
        np.dtype(prec.real))
    return _aperture_probe(jnp.asarray(mask), prec.complex)


def fresnel_kernel(kxs, kys, lam: float, dz: float, precision=None) -> jnp.ndarray:
    """P(kx, ky, dz) = exp(-i pi lambda dz (kx^2 + ky^2)) (Kirkland Eq. 6.65)."""
    prec = get_precision(precision)
    kxs = jnp.asarray(kxs, dtype=prec.real)
    kys = jnp.asarray(kys, dtype=prec.real)
    ksq = kxs[:, None] ** 2 + kys[None, :] ** 2
    phase = (-np.pi * lam * dz) * ksq
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


@jax.jit
def _defocus_ksq_impl(array, P):
    return jnp.fft.ifft2(jnp.fft.fft2(array) * P)


@functools.partial(jax.jit, static_argnames=("lam", "dz", "precision"))
def _defocus_impl(array, kxs, kys, lam, dz, precision):
    # One signed multiply: P(dz) forward-propagates for dz > 0 and
    # back-propagates (P(-|dz|) = conj(P(|dz|))) for dz < 0. The reference's
    # dz < 0 branch divides by P(dz) whose exponent already carries the sign
    # (multislice.py:186-190), a double negation that makes defocus(-d)
    # behave like defocus(+d); the intent per math.txt:62-71 was
    # back-propagation, which this form restores (ledger quirk #13).
    P = fresnel_kernel(kxs, kys, lam, dz, precision)
    return jnp.fft.ifft2(jnp.fft.fft2(array) * P)


_warned_negative_defocus = False


def defocus(array, kxs, kys, lam: float, dz: float, precision=None,
            compat_reference: bool = False, ksq=None) -> jnp.ndarray:
    """Defocus by dz Angstrom; positive dz puts the beam waist above the
    sample; negative dz back-propagates (defocus(-d) inverts defocus(+d))
    (multislice.py:183-190, math.txt:62-71). dz == 0 is the identity.

    ``compat_reference=True`` replicates reference quirk #13: the reference's
    dz < 0 branch divides by P(dz) whose exponent already carries the sign
    (multislice.py:186-190), a double negation that makes defocus(-d) behave
    exactly like defocus(+d). Use it for bit-parity studies against reference
    outputs with negative defocus (same pattern as ``compat_reference_tl``).
    """
    if dz == 0:
        return jnp.asarray(array)
    if dz < 0:
        if compat_reference:
            dz = -dz   # the reference's double negation: defocus(-d) == defocus(+d)
        else:
            global _warned_negative_defocus
            if not _warned_negative_defocus:
                _warned_negative_defocus = True
                import warnings
                warnings.warn(
                    "defocus(dz<0) back-propagates here; the reference's "
                    "dz<0 branch double-negates and behaves like defocus(+dz)"
                    " (multislice.py:186-190). Pass compat_reference=True to "
                    "replicate the reference.", stacklevel=2)
    prec = get_precision(precision)
    if ksq is not None:
        phase = jnp.asarray((-np.pi * lam * dz) * np.asarray(ksq),
                            dtype=prec.real)
        P = _complex_from_phase(phase)
        return _defocus_ksq_impl(jnp.asarray(array), P)
    kxs = np.asarray(kxs, dtype=np.dtype(prec.real))
    kys = np.asarray(kys, dtype=np.dtype(prec.real))
    return _defocus_impl(array, kxs, kys, float(lam), float(dz), prec)


@functools.partial(jax.jit, static_argnames=("precision",))
def _shift_probes_impl(base_array, kxs, kys, positions, precision):
    base_k = jnp.fft.fft2(base_array)

    def one(pos):
        phase = (2.0 * np.pi) * (kxs[:, None] * pos[0] + kys[None, :] * pos[1])
        ramp = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        return jnp.fft.ifft2(base_k * ramp)

    return jax.vmap(one)(positions)


def shift_probes(base_array, kxs, kys, positions, precision=None,
                 cell2d=None) -> jnp.ndarray:
    """Batch of sub-pixel-shifted probes via k-space phase ramps.

    Args:
        base_array: (nx, ny) complex base probe.
        kxs, kys: fftfreq axes (1/Angstrom).
        positions: (n_probes, 2) real-space (x, y) shifts in Angstrom.

    Returns:
        (n_probes, nx, ny) complex. Matches the reference per-position loop
        (multislice.py:216-227) but as a single vmapped k-space multiply: the
        base probe is FFT'd once, each position applies
        exp(2*pi*i*(kx*px + ky*py)).
    """
    prec = get_precision(precision)
    base_array = put_complex_or_real(base_array, prec.complex)
    positions = np.asarray(positions, dtype=np.float64).reshape(-1, 2)
    if cell2d is not None:
        # Oblique cells: the ramp is exp(2 pi i (m f1 + n f2)) with integer
        # frequencies against FRACTIONAL shift coordinates — the same inner
        # formula after transforming the inputs.
        nx, ny = base_array.shape[-2:]
        positions = positions @ np.linalg.inv(
            np.asarray(cell2d, dtype=np.float64)).T
        kxs = np.rint(np.fft.fftfreq(nx) * nx)
        kys = np.rint(np.fft.fftfreq(ny) * ny)
    kxs = np.asarray(kxs, dtype=np.dtype(prec.real))
    kys = np.asarray(kys, dtype=np.dtype(prec.real))
    positions = positions.astype(np.dtype(prec.real))
    return _shift_probes_impl(base_array, kxs, kys, positions, prec)


def probe_grid(xlims, ylims, n: int, m: int) -> np.ndarray:
    """(n*m, 2) scan positions, same construction and ordering as the
    reference (multislice.py:193-195): meshgrid('xy') of n x-values by m
    y-values, flattened row-major (x varies fastest)."""
    x, y = np.meshgrid(np.linspace(*xlims, n), np.linspace(*ylims, m))
    return np.reshape([x, y], (2, x.size)).T


# --- class facade ------------------------------------------------------------


class Probe:
    """Reference-compatible probe object (multislice.py:44-190).

    Attributes: xs, ys, mrad, eV, wavelength, kxs, kys, array.
    ``array`` is a jnp array, (nx, ny) for a single probe or
    (n_probes, nx, ny) for a batch (as produced by create_batched_probes).
    """

    def __init__(self, xs, ys, mrad: float, eV: float, array=None,
                 precision=None, device=None, cell2d=None, ksq=None):
        del device  # accepted for reference signature parity; JAX manages devices
        self.precision = get_precision(precision)
        self.xs = np.asarray(xs)
        self.ys = np.asarray(ys)
        self.mrad = mrad
        self.eV = eV
        self.wavelength = _wavelength(eV)
        self.cell2d = (np.asarray(cell2d, dtype=np.float64)
                       if cell2d is not None else None)
        self.ksq = np.asarray(ksq) if ksq is not None else None
        dx = float(self.xs[1] - self.xs[0])
        dy = float(self.ys[1] - self.ys[0])
        self.kxs = np.fft.fftfreq(len(self.xs), d=dx)
        self.kys = np.fft.fftfreq(len(self.ys), d=dy)
        if array is not None:
            self.array = put_complex_or_real(array, self.precision.complex)
        else:
            self.array = probe_array(self.xs, self.ys, mrad, eV,
                                     self.precision, ksq=self.ksq)

    @property
    def n_probes(self) -> int:
        return 1 if self.array.ndim == 2 else int(self.array.shape[0])

    def copy(self) -> "Probe":
        """Deep copy. (Fixes reference bug #4: the reference's copy()
        references an undefined class, multislice.py:128-141.)"""
        return Probe(self.xs, self.ys, self.mrad, self.eV,
                     array=self.array, precision=self.precision,
                     cell2d=self.cell2d, ksq=self.ksq)

    def to_cpu(self) -> np.ndarray:
        return to_numpy(self.array)

    def defocus(self, dz: float, compat_reference: bool = False) -> None:
        """In-place defocus, matching reference mutation semantics
        (multislice.py:183-190). ``compat_reference=True`` replicates the
        reference's dz < 0 double-negation (quirk #13)."""
        self.array = defocus(self.array, self.kxs, self.kys,
                             self.wavelength, dz, self.precision,
                             compat_reference=compat_reference,
                             ksq=self.ksq)

    def aberrate(self, aberrations=None, **coeffs) -> None:
        """Apply an aberration surface in place (beyond-reference: the
        reference's only aberration is defocus). Pass an
        ``physics.aberrations.Aberrations`` or coefficient kwargs
        (C1/A1/phi_A1/B2/phi_B2/A2/phi_A2/C3/A3/phi_A3/C5, Angstrom /
        radians). ``aberrate(C1=dz)`` is exactly ``defocus(dz)``."""
        from .aberrations import Aberrations, apply_aberrations
        if aberrations is None:
            aberrations = Aberrations(**coeffs)
        elif coeffs:
            aberrations = dataclasses.replace(aberrations, **coeffs)
        self.array = apply_aberrations(self.array, self.kxs, self.kys,
                                       self.wavelength, aberrations,
                                       self.precision, ksq=self.ksq)

    def shifted_batch(self, positions) -> "Probe":
        """New Probe whose array is the (n_probes, nx, ny) shifted batch."""
        batch = shift_probes(self.array if self.array.ndim == 2
                             else self.array[0],
                             self.kxs, self.kys, positions, self.precision,
                             cell2d=self.cell2d)
        return Probe(self.xs, self.ys, self.mrad, self.eV, array=batch,
                     precision=self.precision, cell2d=self.cell2d,
                     ksq=self.ksq)

    def plot(self):  # pragma: no cover - visualization helper
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        arr = np.abs(self.to_cpu()) ** 0.25
        if arr.ndim == 3:
            arr = arr[0]
        extent = (self.xs.min(), self.xs.max(), self.ys.min(), self.ys.max())
        ax.imshow(arr.T, cmap="inferno", extent=extent)
        plt.show()


def create_batched_probes(base_probe: Probe, probe_positions,
                          device=None) -> Probe:
    """Reference-compatible facade (multislice.py:198-235): returns a Probe
    whose array is (n_probes, nx, ny), each shifted to its position."""
    del device
    return base_probe.shifted_batch(np.asarray(probe_positions))

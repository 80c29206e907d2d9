"""Probe aberrations — the full low-order aberration surface.

The reference supports exactly one aberration, defocus (multislice.py:183-190).
Real STEM instruments are characterized by a polynomial aberration function;
this module implements the standard Krivanek/Kirkland expansion up to fifth
order (Kirkland, "Advanced Computing in Electron Microscopy", Eq. 5.45 form)
so simulated probes can match measured instrument states:

    chi(q, phi) = (2 pi / lam) * [
        (lam^2 q^2 / 2) * (C1 + A1 cos 2(phi - phi_A1))
      + (lam^3 q^3 / 3) * (B2 cos  (phi - phi_B2)
                           + A2 cos 3(phi - phi_A2))
      + (lam^4 q^4 / 4) * (C3 + A3 cos 4(phi - phi_A3))
      + (lam^6 q^6 / 6) *  C5 ]

    transfer(q, phi) = exp(-i chi)

with q = |k| in 1/Angstrom, phi = azimuth, and all coefficients in Angstrom
(C3 = Cs: 1 mm = 1e7 A). The C1 term reduces to exp(-i pi lam dz q^2) — the
existing ``probe.defocus`` Fresnel multiply — so ``aberrate(C1=dz)`` and
``defocus(dz)`` are exactly the same operation (tested).

TPU notes: the phase is built from the fftfreq k grids on host-free jnp ops
and applied as one jitted k-space multiply (fft2 -> * exp(-i chi) -> ifft2);
|transfer| == 1 so probe norm is conserved. Oblique (non-orthogonal) cells
carry |k|^2 via ``ksq`` for the isotropic terms (C1/C3/C5); the azimuthal
terms need true Cartesian k components and raise on oblique grids.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import get_precision


@dataclasses.dataclass(frozen=True)
class Aberrations:
    """Aberration coefficients, Krivanek notation, lengths in Angstrom,
    azimuths (phi_*) in radians.

    C1: defocus (== Probe.defocus dz; positive focuses the beam waist
        above the sample). A1: twofold astigmatism. B2: axial coma.
    A2: threefold astigmatism. C3: spherical aberration (Cs).
    A3: fourfold astigmatism. C5: fifth-order spherical aberration.
    """
    C1: float = 0.0
    A1: float = 0.0
    phi_A1: float = 0.0
    B2: float = 0.0
    phi_B2: float = 0.0
    A2: float = 0.0
    phi_A2: float = 0.0
    C3: float = 0.0
    A3: float = 0.0
    phi_A3: float = 0.0
    C5: float = 0.0

    def is_isotropic(self) -> bool:
        return self.A1 == 0.0 and self.B2 == 0.0 and self.A2 == 0.0 \
            and self.A3 == 0.0

    def is_zero(self) -> bool:
        return self.is_isotropic() and self.C1 == 0.0 and self.C3 == 0.0 \
            and self.C5 == 0.0

    def scherzer_defocus(self, lam: float) -> float:
        """Scherzer (optimum) defocus -sqrt(1.5 C3 lam) for this C3
        (Kirkland Eq. 5.31); C1 is ignored."""
        if self.C3 <= 0:
            raise ValueError("Scherzer defocus needs C3 > 0")
        return -float(np.sqrt(1.5 * self.C3 * lam))


def chi_phase(ksq, kx=None, ky=None, *, lam: float,
              ab: Aberrations):
    """The aberration phase chi on a k grid (radians, real array).

    ``ksq``: |k|^2 grid (1/A^2). ``kx``/``ky``: Cartesian k component grids,
    required only when anisotropic coefficients are nonzero (for the
    azimuth). Works on numpy or jnp inputs.
    """
    q2 = ksq
    l2 = lam * lam
    # isotropic terms: (2 pi / lam) * lam^(n+1) q^(n+1) C / (n+1) with
    # even powers only -> polynomial in q^2
    chi = (np.pi * lam) * ab.C1 * q2
    if ab.C3 != 0.0:
        chi = chi + (0.5 * np.pi * lam * l2) * ab.C3 * (q2 * q2)
    if ab.C5 != 0.0:
        chi = chi + (np.pi / 3.0 * lam * l2 * l2) * ab.C5 * (q2 * q2 * q2)
    if ab.is_isotropic():
        return chi
    if kx is None or ky is None:
        raise ValueError(
            "anisotropic aberrations (A1/B2/A2/A3) need Cartesian kx/ky "
            "grids — unavailable on oblique cells")
    phi = jnp.arctan2(ky, kx) if isinstance(q2, jnp.ndarray) \
        else np.arctan2(ky, kx)
    q = jnp.sqrt(q2) if isinstance(q2, jnp.ndarray) else np.sqrt(q2)
    cos = jnp.cos if isinstance(q2, jnp.ndarray) else np.cos
    if ab.A1 != 0.0:
        chi = chi + (np.pi * lam) * ab.A1 * q2 * cos(2 * (phi - ab.phi_A1))
    q3 = q2 * q
    if ab.B2 != 0.0:
        chi = chi + (2 * np.pi / 3 * l2) * ab.B2 * q3 * cos(phi - ab.phi_B2)
    if ab.A2 != 0.0:
        chi = chi + (2 * np.pi / 3 * l2) * ab.A2 * q3 \
            * cos(3 * (phi - ab.phi_A2))
    if ab.A3 != 0.0:
        chi = chi + (0.5 * np.pi * lam * l2) * ab.A3 * (q2 * q2) \
            * cos(4 * (phi - ab.phi_A3))
    return chi


@jax.jit
def _apply_phase(array, chi):
    transfer = jax.lax.complex(jnp.cos(chi), -jnp.sin(chi))   # exp(-i chi)
    return jnp.fft.ifft2(jnp.fft.fft2(array) * transfer)


def apply_aberrations(array, kxs, kys, lam: float, ab: Aberrations,
                      precision=None, ksq=None) -> jnp.ndarray:
    """Multiply ``array`` (real-space probe, (..., nx, ny) complex) by the
    aberration transfer function exp(-i chi) in k-space.

    ``ksq``: optional (nx, ny) |k|^2 grid for oblique cells (isotropic
    coefficients only). Norm is conserved (|transfer| == 1).
    """
    prec = get_precision(precision)
    if ab.is_zero():
        return jnp.asarray(array)
    rdt = np.dtype(prec.real)
    if ksq is not None:
        q2 = np.asarray(ksq, dtype=rdt)
        chi = chi_phase(q2, lam=lam, ab=ab)   # raises if anisotropic
    else:
        kx = np.asarray(kxs, dtype=rdt)[:, None]
        ky = np.asarray(kys, dtype=rdt)[None, :]
        q2 = kx * kx + ky * ky
        kxg, kyg = np.broadcast_arrays(kx, ky)
        chi = chi_phase(q2, kxg, kyg, lam=lam, ab=ab)
    return _apply_phase(jnp.asarray(array), jnp.asarray(chi, dtype=rdt))

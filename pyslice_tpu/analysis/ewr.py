"""Focal-series exit-wave reconstruction (beyond-reference).

The reference records complex exit waves directly because it is a
simulator (src/postprocessing/wf_data.py — `wavefunction_data` is
complex). An experiment records only intensities; recovering the complex
exit wave from a through-focal series of HRTEM images is the classic
imaging-side inverse problem. This module implements **IWFR** (iterative
wave-function reconstruction: Allen, McBride, O'Leary & Oxley,
Ultramicroscopy 100 (2004) 91-104) against the same objective-lens model
used by the forward CTEM path (engine.ctem.objective_transfer):

    phi_n = ifft2( fft2(psi) * H_n ),   H_n = A(k) exp(-i chi_n(k)),
    I_n   = |phi_n|^2.

Each iteration projects the current estimate onto every measured plane
(replace |phi_n| with sqrt(I_n), keep the phase), back-propagates with
conj(H_n) (the exact inverse where |H|=1; the adjoint inside an objective
aperture), and averages. Noiseless, aperture-free data makes the true
wave a fixed point; with an aperture the reconstruction is the
band-limited wave (content outside the aperture never reached the
detector and is set to zero).

The whole solver is ONE jitted `lax.scan` program (like ePIE,
analysis/ptychography.py): the focal stack stays on device, planes are
processed as a batched FFT over the defocus axis (MXU/VPU friendly), and
only the final wave and the per-iteration residual history return to the
host. Complex arrays cross the host<->device boundary via utils.host
(axon relay rule).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import get_precision
from ..physics.aberrations import Aberrations


@partial(jax.jit, static_argnames=("n_iters",))
def _iwfr(amps, h_re, h_im, p0_re, p0_im, n_iters: int):
    """amps (N, nx, ny) = sqrt(I_n); H as real planes (N, nx, ny)."""
    transfer = jax.lax.complex(h_re, h_im)
    transfer_c = jnp.conj(transfer)
    norm = jnp.sum(amps * amps)

    def body(psi, _):
        phi = jnp.fft.ifft2(jnp.fft.fft2(psi)[None, :, :] * transfer)
        mag = jnp.abs(phi)
        # relative intensity-domain residual BEFORE the modulus projection
        err = jnp.sum((mag - amps) ** 2) / norm
        unit = phi / jnp.where(mag > 0, mag, 1.0)
        back = jnp.fft.ifft2(jnp.fft.fft2(amps * unit) * transfer_c)
        return jnp.mean(back, axis=0), err

    psi, errs = jax.lax.scan(body, jax.lax.complex(p0_re, p0_im),
                             None, length=n_iters)
    return jnp.real(psi), jnp.imag(psi), errs


def iwfr_reconstruct(images, defoci: Sequence[float], kxs, kys, *,
                     lam: float,
                     ab: Optional[Aberrations] = None,
                     aperture: Optional[float] = None,
                     ksq=None,
                     n_iters: int = 100,
                     init=None,
                     precision=None
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Reconstruct the exit wave from a through-focal series.

    images : (N, nx, ny) measured image intensities.
    defoci : N defocus values (Angstrom) ADDED to ``ab.C1`` per plane —
        the same convention as engine.ctem.hrtem_image's chromatic nodes.
    ab / aperture / ksq : the objective-lens state shared by all planes
        (engine.ctem.objective_transfer contract; ksq for oblique cells).
    init : optional complex starting wave (nx, ny); default is a plane
        wave with the series' mean amplitude.
    Returns (psi (nx, ny) complex host ndarray, residuals (n_iters,)) —
    ``residuals[i]`` is sum_n (|phi_n| - sqrt(I_n))^2 / sum_n I_n before
    iteration i's projection, so residuals[-1] measures the final fit.

    The global phase is unobservable: compare reconstructions up to one
    overall phase factor.
    """
    from ..engine.ctem import _transfer_planes, objective_transfer
    from ..utils.host import to_device_complex, to_numpy

    prec = get_precision(precision)
    rdt = np.dtype(prec.real)
    imgs = np.asarray(images, dtype=rdt)
    if imgs.ndim != 3:
        raise ValueError(f"images must be (n_planes, nx, ny), "
                         f"got {imgs.shape}")
    defoci = np.asarray(defoci, dtype=np.float64).ravel()
    if defoci.shape[0] != imgs.shape[0]:
        raise ValueError(f"{imgs.shape[0]} images but {defoci.shape[0]} "
                         f"defoci")
    if np.any(imgs < 0):
        raise ValueError("images are intensities and must be >= 0")

    base = ab if ab is not None else Aberrations()
    planes = [_transfer_planes(objective_transfer(
        kxs, kys, lam=lam,
        ab=dataclasses.replace(base, C1=base.C1 + float(d)),
        aperture=aperture, ksq=ksq, precision=prec), prec)
        for d in defoci]
    h_re = jnp.stack([p[0] for p in planes])
    h_im = jnp.stack([p[1] for p in planes])

    amps = jnp.asarray(np.sqrt(imgs))
    if init is None:
        mean_amp = float(np.sqrt(imgs.mean()))
        psi0 = np.full(imgs.shape[1:], mean_amp, dtype=prec.complex)
    else:
        psi0 = np.asarray(init, dtype=prec.complex)
        if psi0.shape != imgs.shape[1:]:
            raise ValueError(f"init shape {psi0.shape} != image shape "
                             f"{imgs.shape[1:]}")
    p0 = to_device_complex(psi0, prec.complex)
    re, im, errs = _iwfr(amps, h_re, h_im, jnp.real(p0), jnp.imag(p0),
                         int(n_iters))
    return (to_numpy(re) + 1j * to_numpy(im)).astype(prec.complex), \
        to_numpy(errs)

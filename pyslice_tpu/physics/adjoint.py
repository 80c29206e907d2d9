"""O(1)-memory adjoint for the multislice chain (differentiable multislice).

``multislice_diff`` is a drop-in differentiable version of
``physics.propagate.multislice`` for inverse problems — multislice
ptychography, exit-wave refinement, potential tomography. It fixes the two
things that make naive ``jax.grad`` through the slice loop unusable at
production sizes:

* **Memory.** Reverse-mode through a ``lax.scan`` stores every intermediate
  wavefunction: ``nz x n_probes x nx x ny`` complex residuals (e.g. 26 GB
  for 100 slices x 16 probes x 1024^2 — far beyond HBM). The multislice
  step is *unitary* (|t| = 1 exactly, |P| = 1 without a bandwidth limit),
  so the backward pass here re-derives each intermediate by running the
  chain in reverse from the exit wave instead of storing it: the adjoint
  needs O(1) wavefunction state regardless of depth.
* **Kernel dispatch.** The Pallas fused kernels (ops.fused_step*) have no
  autodiff rules, so ``jax.grad`` silently forces the slow XLA path. With
  a hand-written VJP the *forward* pass is free to use the fastest kernel
  for the shape — gradients at fused-kernel speed.

Adjoint derivation (verified against ``jax.vjp`` to ~1e-15, see
tests/test_adjoint.py). Forward, per slice z (Kirkland Eq. 6.66;
/root/reference/src/multislice/multislice.py:278-294):

    a_z     = t_z * psi_z,          t_z = exp(i sigma V_z)
    psi_z+1 = ifft2(P * fft2(a_z))                     [skipped after last]

With JAX's transpose (not conjugate-transpose) cotangent convention, the
exit-wave cotangent ``g`` propagates backward as ``lam_z = fft2(P *
ifft2(t_z+1 * lam_z+1))`` while the primal reconstructs as ``a_z =
ifft2(conj(P) * fft2(conj(t_z+1) * a_z+1))``; conjugating the latter gives
*the same* recurrence, so one stacked chain ``u = [conj(a), lam]`` carries
both. Per slice the potential cotangent is ``Vbar_z = sum_batch
Re(i sigma * lam_z * a_z)`` and at the entrance ``psibar = t_0 * lam_0``.

Cost: the backward scan does 2 FFT pairs per slice (reconstruction +
cotangent, fused in one doubled batch) vs the forward's 1 — a
grad-evaluation is ~3x a forward pass, the standard reverse-mode ratio,
with no O(nz) residual traffic.

Restrictions: ``bandwidth_limit``/``kmax2`` and ``record_layers`` are
intentionally *not offered* as parameters here — a band limit zeroes |P|
outside the band, so the unitary reconstruction this O(1)-memory scheme
relies on no longer exists (there is no runtime check because there is no
argument to check). For band-limited gradients, apply ``jax.checkpoint``
over ``propagate.multislice`` instead. Beam tilt and oblique ``ksq``
metrics are pure phases — both supported.

Float32 note: reconstruction replays nz unitary steps, so roundoff grows
~O(nz * eps) relative (~1e-5 at 200 slices) — measured harmless for
optimization (tests/test_adjoint.py::test_f32_drift); use
``precision="double"`` on CPU for verification-grade gradients.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import interaction_parameter, wavelength as _wavelength
from ..core.dtypes import get_precision, Precision
from ..ops import matfft
from .propagate import multislice, tilt_tangents, transmission


def multislice_diff(psi, potential_szy, kxs, kys, *, eV: float,
                    lam: Optional[float] = None, dz: float,
                    precision: Optional[Precision] = None,
                    fused: Optional[bool] = None,
                    ksq: Optional[jnp.ndarray] = None,
                    tilt: Optional[Tuple[float, float]] = None,
                    tantilt: Optional[Tuple[float, float]] = None):
    """Differentiable multislice: same result as ``propagate.multislice``,
    with a custom O(1)-memory VJP w.r.t. ``psi`` and ``potential_szy``.

    Cotangents for ``kxs``/``kys``/``ksq`` are defined as ZERO (the
    sampling axes are geometry, not parameters — differentiate w.r.t. the
    probe and the potential only).
    """
    prec = get_precision(precision)
    lam_f = float(lam) if lam is not None else _wavelength(eV)
    if tantilt is None:
        tantilt = tilt_tangents(tilt)
    elif tilt is not None:
        raise ValueError("pass tilt (mrad) OR tantilt (tangents), not both")
    if tantilt is not None and ksq is not None:
        raise ValueError("beam tilt needs an orthogonal cell")
    cfg = (float(eV), lam_f, float(dz), prec, tantilt, fused)
    # Canonicalize dtypes BEFORE entering the custom_vjp so the cotangents
    # the backward pass produces (all in ``prec``) match the primal avals.
    psi = jnp.asarray(psi, dtype=prec.complex)
    potential_szy = jnp.asarray(potential_szy, dtype=prec.real)
    kxs = jnp.asarray(kxs, dtype=prec.real)
    kys = jnp.asarray(kys, dtype=prec.real)
    if ksq is not None:
        ksq = jnp.asarray(ksq, dtype=prec.real)
    return _ms_diff(cfg, psi, potential_szy, kxs, kys, ksq)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _ms_diff(cfg, psi, potential_szy, kxs, kys, ksq):
    return _forward(cfg, psi, potential_szy, kxs, kys, ksq)


def _forward(cfg, psi, potential_szy, kxs, kys, ksq):
    eV, lam, dz, prec, tantilt, fused = cfg
    return multislice(psi, potential_szy, kxs, kys, eV=eV, lam=lam, dz=dz,
                      precision=prec, fused=fused, ksq=ksq, tantilt=tantilt)


def _ms_diff_fwd(cfg, psi, potential_szy, kxs, kys, ksq):
    exit_wave = _forward(cfg, psi, potential_szy, kxs, kys, ksq)
    # Residuals are the exit wave (which IS the primal output — no extra
    # memory) plus the inputs; no per-slice state is stored.
    return exit_wave, (exit_wave, potential_szy, kxs, kys, ksq)


def _propagator(cfg, kxs, kys, ksq, prec):
    """P in k-space — the same plane the forward paths build."""
    eV, lam, dz, _, tantilt, _ = cfg
    if ksq is not None:
        k2 = jnp.asarray(ksq, dtype=prec.real)
    else:
        k2 = (jnp.asarray(kxs, prec.real)[:, None] ** 2
              + jnp.asarray(kys, prec.real)[None, :] ** 2)
    phase = (-np.pi * lam * dz) * k2
    P = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    if tantilt is not None:
        tph = (2.0 * np.pi * dz) * (
            jnp.asarray(kxs, prec.real)[:, None] * tantilt[0]
            + jnp.asarray(kys, prec.real)[None, :] * tantilt[1])
        P = P * jax.lax.complex(jnp.cos(tph), jnp.sin(tph))
    return P


def _bwd_fused_kind(cfg, a, nz):
    """Which fused Pallas backward fits (ops.fused_step_adjoint): 'aligned'
    for 128-divisible axes, 'odd' for composite odd grids, None -> the XLA
    scan. Reuses the FORWARD dispatch predicates (propagate._fused_eligible
    and friends: TPU backend, single precision, ops.config gate, per-axis
    size rules) so forward and backward eligibility cannot drift apart.
    Trace-time decision, like every kernel dispatch here."""
    from .propagate import _fused_eligible, _fused_odd_eligible
    eV, lam, dz, prec, tantilt, fused = cfg
    if fused is False or nz < 2 or a.ndim not in (2, 3):
        return None
    shape3 = a.shape if a.ndim == 3 else (1,) + tuple(a.shape)
    if _fused_eligible(shape3, None, prec):
        return "aligned"
    if _fused_odd_eligible(shape3, None, prec):
        return "odd"
    return None


def _ms_diff_bwd(cfg, residuals, g):
    eV, lam, dz, prec, tantilt, fused = cfg
    exit_wave, potential_szy, kxs, kys, ksq = residuals
    sigma = interaction_parameter(eV)
    lam_e = lam if lam is not None else _wavelength(eV)

    pot = jnp.asarray(potential_szy, dtype=prec.real)
    nz = pot.shape[0]
    a = jnp.asarray(exit_wave, dtype=prec.complex)       # a_{nz-1} = exit
    lam_ct = jnp.asarray(g, dtype=prec.complex)          # lam_{nz-1} = gbar
    batch_axes = tuple(range(a.ndim - 2))

    def vbar_of(lam_z, a_z):
        # Vbar_z = sum_batch Re(i sigma lam a) = -sigma sum_batch Im(lam a)
        return (-sigma) * jnp.sum(jnp.imag(lam_z * a_z), axis=batch_axes)

    vbar_last = vbar_of(lam_ct, a)

    kind = _bwd_fused_kind(cfg, a, nz) if nz > 1 else None
    if kind is not None:
        from ..ops.fused_step_adjoint import (fused_adjoint_chain,
                                              fused_adjoint_chain_odd)
        chain = (fused_adjoint_chain if kind == "aligned"
                 else fused_adjoint_chain_odd)
        squeeze = a.ndim == 2
        a3 = a[None] if squeeze else a
        g3 = lam_ct[None] if squeeze else lam_ct
        lam0, vbar_chain = chain(
            a3, g3, pot, kxs, kys, sigma=sigma, lam=lam_e, dz=dz,
            ksq=ksq, tantilt=tantilt)
        if squeeze:
            lam0 = lam0[0]
        vbar = jnp.concatenate([vbar_chain, vbar_last[None]], axis=0)
        psibar = transmission(pot[0], sigma, prec) * lam0
        zeros = lambda x: None if x is None else jnp.zeros_like(x)
        return psibar, vbar, zeros(kxs), zeros(kys), zeros(ksq)

    if nz > 1:
        P = _propagator(cfg, kxs, kys, ksq, prec)
        # One stacked chain carries both the primal reconstruction
        # (conj(a)) and the cotangent (lam): identical recurrence.
        u = jnp.stack([jnp.conj(a), lam_ct])

        def bstep(u, v_slice):
            t = transmission(v_slice, sigma, prec)
            u = matfft.fft2(P * matfft.ifft2(t * u))
            return u, vbar_of(u[1], jnp.conj(u[0]))

        # reverse=True: consume slices nz-1 .. 1; ys[i] lands at xs index i,
        # i.e. the emission from consuming slice z+1 (= Vbar_z) sits at
        # index z of the stacked output — already in slice order.
        u, vbar_rest = jax.lax.scan(bstep, u, pot[1:], reverse=True)
        lam0 = u[1]
        vbar = jnp.concatenate([vbar_rest, vbar_last[None]], axis=0)
    else:
        lam0 = lam_ct
        vbar = vbar_last[None]

    psibar = transmission(pot[0], sigma, prec) * lam0
    zeros = lambda x: None if x is None else jnp.zeros_like(x)
    return psibar, vbar, zeros(kxs), zeros(kys), zeros(ksq)


_ms_diff.defvjp(_ms_diff_fwd, _ms_diff_bwd)

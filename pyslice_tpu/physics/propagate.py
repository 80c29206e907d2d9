"""The multislice propagation loop — the hot kernel.

Kirkland Eq. 6.66 (see /root/reference/math.txt:49-60 and
/root/reference/src/multislice/multislice.py:237-299): per slice z,

    psi <- t_z * psi,            t_z = exp(i sigma V(x, y, z))
    psi <- ifft2(P * fft2(psi)), P   = exp(-i pi lambda dz (kx^2 + ky^2))

with the Fresnel step *skipped after the last slice* (multislice.py:289).

TPU-native design: a ``lax.scan`` over the slice axis of a slice-major
(nz, nx, ny) potential, broadcasting over an arbitrary probe batch
(n_probes, nx, ny) — XLA batches the 2-D FFTs over the leading axis and fuses
the transmission exponential into the surrounding elementwise work. No Python
loops, no in-place probe mutation (reference bug #7).

Optionally records depth-resolved exit waves: ``record_layers`` selects slice
indices whose *post-transmission* wavefunction is snapshotted (the exit wave
at depth z); the final slice's snapshot equals the reference's return value.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import interaction_parameter, wavelength as _wavelength
from ..core.dtypes import get_precision, Precision
from ..ops import config as ops_config
from ..ops import matfft
from .probe import fresnel_kernel


def _fused_eligible(psi_shape, record_layers, prec) -> bool:
    from ..ops import fused_step
    if ops_config.fused_multislice == "off":
        return False
    if prec.name != "single":
        return False
    if len(psi_shape) != 3:
        return False
    nx, ny = psi_shape[-2], psi_shape[-1]
    if not (fused_step.supported_size(nx) and fused_step.supported_size(ny)):
        return False
    if jax.default_backend() != "tpu":
        return False
    return True


def _resident_eligible(psi_shape, nz, prec) -> bool:
    """The VMEM-resident kernel (ops.fused_step_resident): the whole slice
    loop in one pallas_call. A strict subset of the aligned-kernel
    eligibility, taken only where it measures faster (resident_preferred).

    NOTE: like every ops.config flag, this is resolved at TRACE time.
    multislice() resolves it outside its jit boundary; callers that jit
    around it themselves (engine.pipeline with a cached SimSpec) bake the
    decision into the trace — create a fresh SimSpec to re-dispatch."""
    from ..ops import fused_step_resident
    if not _fused_eligible(psi_shape, None, prec):
        return False
    if ops_config.resident_multislice == "off":
        return False
    n_probes, nx, ny = psi_shape
    return (fused_step_resident.resident_supported(nx, ny, nz)
            and fused_step_resident.resident_preferred(n_probes, nx, ny))


def _resident_odd_eligible(psi_shape, nz, prec) -> bool:
    """Single-dispatch VMEM-resident kernel for composite odd grids
    (ops.fused_step_odd_resident): preferred over the odd two-pass chain
    wherever its VMEM estimate fits (measured faster at every probe count
    — see resident_odd_preferred)."""
    from ..ops import fused_step_odd_resident as odr
    if not _fused_odd_eligible(psi_shape, None, prec):
        return False
    if ops_config.resident_multislice == "off":
        return False
    n_probes, nx, ny = psi_shape
    return (odr.resident_odd_supported(nx, ny, nz, n_probes)
            and odr.resident_odd_preferred(n_probes, nx, ny))


def _fused_odd_eligible(psi_shape, record_layers, prec) -> bool:
    """Composite odd grids: the digit-split Pallas kernel
    (ops.fused_step_odd). Same constraints as the aligned kernel except the
    size rule: both axes composite with smallest prime factor <= MAX_D."""
    from ..ops import fused_step_odd
    if ops_config.fused_multislice == "off":
        return False
    if prec.name != "single":
        return False
    if len(psi_shape) != 3:
        return False
    nx, ny = psi_shape[-2], psi_shape[-1]
    n_probes = psi_shape[0]
    if not (fused_step_odd.supported_size_odd(nx, n_probes)
            and fused_step_odd.supported_size_odd(ny, n_probes)):
        return False
    if jax.default_backend() != "tpu":
        return False
    return True


def _scrambled_axes(psi_shape) -> Tuple[bool, bool]:
    """Per-axis decision: run the in-loop FFT pair in digit-scrambled
    frequency order (ops.matfft.fft_scrambled — transpose-free four-step)?
    Only the *order* of k-space changes, and only between the forward
    transform and the Fresnel multiply, which is diagonal — the propagator
    is pre-scrambled to match, so results are identical."""
    nx, ny = psi_shape[-2], psi_shape[-1]
    mode = ops_config.scrambled_fft
    if mode == "off":
        return False, False

    def ok(n):
        if not matfft.scrambled_ok(n):
            return False
        if mode == "on":
            return True
        return matfft._prefer_matmul(n)    # auto: TPU and not power of two

    return ok(nx), ok(ny)


def bandwidth_kmax2(kxs, kys, bandwidth_limit: Optional[float],
                    ksq=None) -> Optional[float]:
    """Squared k cutoff for antialiasing bandwidth limiting.

    ``bandwidth_limit`` is a fraction of the tightest axis Nyquist
    frequency (Kirkland's temsim uses 2/3: the multislice product
    t*psi doubles bandwidth each slice, and 2/3 is the largest circular
    band whose self-convolution aliases entirely outside itself). For
    oblique cells the per-axis Nyquist comes from the metric (``ksq`` at
    the axis midpoints). Returns kmax^2 in 1/Angstrom^2, or None.
    """
    if bandwidth_limit is None:
        return None
    if not 0.0 < bandwidth_limit <= 1.0:
        raise ValueError(
            f"bandwidth_limit must be in (0, 1], got {bandwidth_limit}")
    if ksq is not None:
        k2 = np.asarray(ksq)
        nyq_x = float(np.sqrt(k2[k2.shape[0] // 2, 0]))
        nyq_y = float(np.sqrt(k2[0, k2.shape[1] // 2]))
    else:
        nyq_x = float(np.max(np.abs(np.asarray(kxs))))
        nyq_y = float(np.max(np.abs(np.asarray(kys))))
    return (float(bandwidth_limit) * min(nyq_x, nyq_y)) ** 2


def tilt_tangents(tilt_mrad) -> Optional[Tuple[float, float]]:
    """(tan theta_x, tan theta_y) for a beam tilt given in mrad.

    Small-tilt tilted-propagator multislice (Kirkland ch. 6): each Fresnel
    step gains the pure phase exp(2 pi i dz (kx tan tx + ky tan ty)),
    advecting the wave laterally by dz*tan(theta) per slice — the beam
    travels obliquely through an unrotated potential (equivalently, the
    specimen is tilted by -theta relative to the optic axis, exact to
    first order in theta; valid for tilts up to a few tens of mrad where
    the k^2 correction of the exact tilted propagator is negligible).
    """
    if tilt_mrad is None:
        return None
    tx, ty = (float(t) for t in tilt_mrad)
    if tx == 0.0 and ty == 0.0:
        return None
    return (float(np.tan(tx * 1e-3)), float(np.tan(ty * 1e-3)))


def transmission(potential_slice, sigma, precision=None) -> jnp.ndarray:
    """t = exp(i sigma V) (multislice.py:281-286). |t| == 1 exactly."""
    prec = get_precision(precision)
    phase = jnp.asarray(sigma, dtype=prec.real) * potential_slice.astype(prec.real)
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def multislice(psi, potential_szy, kxs, kys, *, eV: float,
               lam: Optional[float] = None, dz: float,
               record_layers: Optional[Tuple[int, ...]] = None,
               precision: Optional[Precision] = None,
               fused: Optional[bool] = None,
               ksq: Optional[jnp.ndarray] = None,
               bandwidth_limit: Optional[float] = None,
               kmax2: Optional[float] = None,
               tilt: Optional[Tuple[float, float]] = None,
               tantilt: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """Public entry: resolves the fused-path decision OUTSIDE the jit
    boundary so it participates in the compilation cache key (the
    ops.config flag alone would not invalidate cached traces).

    ``ksq``: optional (nx, ny) |k|^2 array for OBLIQUE in-plane cells
    (carries the 2 m n b1.b2 cross term); None = separable kxs^2 + kys^2.

    ``bandwidth_limit``: optional antialiasing band limit as a fraction of
    the tightest-axis Nyquist (2/3 is the standard choice — Kirkland's
    temsim). Folded into the Fresnel multiplier on every kernel path, so
    it costs nothing per step. Off (None) by default for reference parity;
    note |P| < 1 outside the band, so norm is intentionally NOT conserved.

    ``tilt``: optional (theta_x, theta_y) beam tilt in mrad —
    tilted-propagator multislice (see ``tilt_tangents``); needs an
    orthogonal cell (the tilt phase is separable in physical kx/ky).
    """
    prec = get_precision(precision)
    if kmax2 is None:
        kmax2 = bandwidth_kmax2(kxs, kys, bandwidth_limit, ksq)
    elif bandwidth_limit is not None:
        raise ValueError("pass bandwidth_limit OR kmax2, not both")
    if tantilt is None:
        tantilt = tilt_tangents(tilt)
    elif tilt is not None:
        raise ValueError("pass tilt (mrad) OR tantilt (tangents), not both")
    if tantilt is not None and ksq is not None:
        raise ValueError(
            "beam tilt needs an orthogonal cell (the tilt phase is "
            "separable in physical kx/ky; oblique metrics carry no "
            "per-axis k components)")
    shape = jnp.shape(psi)
    nz = jnp.shape(potential_szy)[0]
    def pick_fused():
        if _resident_eligible(shape, nz, prec):
            return "resident"
        if _fused_eligible(shape, record_layers, prec):
            return "aligned"
        if _resident_odd_eligible(shape, nz, prec):
            return "odd_resident"
        if _fused_odd_eligible(shape, record_layers, prec):
            return "odd"
        return None

    if fused is None:
        kernel = pick_fused()
        if kernel is None:
            if ops_config.fused_multislice == "on":
                raise ValueError(
                    "ops.config.fused_multislice == 'on' but no fused "
                    f"kernel fits this problem (shape {shape}; needs TPU, "
                    "single precision, 3-D probe batch, and grid axes "
                    "either divisible by 128 or small-factor composite)")
            kernel = "xla"
    elif fused:
        kernel = pick_fused()
        if kernel is None:
            raise ValueError(
                "fused=True requested but the problem is not eligible "
                "(needs TPU, single precision, 3-D probe batch, and grid "
                "axes either divisible by 128 or composite with a small "
                "prime factor)")
    else:
        kernel = "xla"
    scrambled = ((False, False) if kernel != "xla"
                 else _scrambled_axes(shape))
    # ops_key folds every trace-time kernel knob (fused_dot, complex_einsum,
    # scrambled_d, ...) into the jit cache key: flipping an ops.config field
    # mid-process retraces with the new value instead of silently reusing a
    # kernel compiled under the old one (round-2 weak #5).
    return _multislice_jit(psi, potential_szy, kxs, kys, ksq, eV=eV,
                           lam=lam, dz=dz, record_layers=record_layers,
                           precision=prec, kernel=kernel,
                           scrambled=scrambled, kmax2=kmax2,
                           tantilt=tantilt,
                           ops_key=ops_config.ops_key())


@functools.partial(jax.jit,
                   static_argnames=("eV", "lam", "dz", "record_layers",
                                    "precision", "kernel", "scrambled",
                                    "kmax2", "tantilt", "ops_key"))
def _multislice_jit(psi, potential_szy, kxs, kys, ksq=None, *, eV: float,
                    lam: Optional[float] = None, dz: float,
                    record_layers: Optional[Tuple[int, ...]] = None,
                    precision: Optional[Precision] = None,
                    kernel: str = "xla",
                    scrambled: Tuple[bool, bool] = (False, False),
                    kmax2: Optional[float] = None,
                    tantilt: Optional[Tuple[float, float]] = None,
                    ops_key=None) -> jnp.ndarray:
    """Propagate probe batch ``psi`` through a slice-major potential.

    Args:
        psi: (..., nx, ny) complex probe(s); any number of leading batch dims.
        potential_szy: (nz, nx, ny) real projected potential (slice-major).
        kxs, kys: physical fftfreq axes (1/Angstrom, actual pitch).
        eV: accelerating voltage (static — folds sigma/lambda into constants).
        lam: electron wavelength in Angstrom (default: wavelength(eV)).
        dz: slice spacing in Angstrom (static).
        record_layers: optional strictly-increasing tuple of slice indices to
            snapshot (post-transmission). None -> return only the exit wave
            with the same shape as ``psi``; otherwise an extra leading axis of
            length len(record_layers) is prepended.

    Returns:
        Exit wave(s): shape of psi, or (n_layers, *psi.shape).
    """
    prec = get_precision(precision)
    lam = lam if lam is not None else _wavelength(eV)
    sigma = interaction_parameter(eV)

    psi = jnp.asarray(psi, dtype=prec.complex)
    potential_szy = jnp.asarray(potential_szy, dtype=prec.real)
    nz = potential_szy.shape[0]

    if record_layers is not None:
        layers = tuple(int(l) for l in record_layers)
        if any(b <= a for a, b in zip(layers, layers[1:])):
            raise ValueError("record_layers must be strictly increasing")
        if layers and (layers[0] < 0 or layers[-1] >= nz):
            raise ValueError(f"record_layers out of range [0, {nz - 1}]")

    if kernel == "resident":
        # VMEM-resident Pallas path: the wavefunction never leaves VMEM
        # during the slice loop — one 4 MB potential read per slice-step
        # (see ops.fused_step_resident).
        from ..ops.fused_step_resident import fused_multislice_resident
        return fused_multislice_resident(psi, potential_szy, kxs, kys,
                                         sigma=sigma, lam=lam, dz=dz,
                                         record_layers=record_layers,
                                         ksq=ksq, kmax2=kmax2,
                                         tantilt=tantilt)
    if kernel == "aligned":
        # Fused Pallas path: 2 HBM passes per slice instead of ~6 (see
        # ops.fused_step) — ~3.2x on v5e at 1024^2 x 16 probes.
        from ..ops.fused_step import fused_multislice
        return fused_multislice(psi, potential_szy, kxs, kys, sigma=sigma,
                                lam=lam, dz=dz, record_layers=record_layers,
                                ksq=ksq, kmax2=kmax2, tantilt=tantilt)
    if kernel == "odd_resident":
        # Single-dispatch VMEM-resident digit-split path for composite odd
        # grids (fused_step_odd_resident) — the reference-natural
        # int(l/s)+1 shapes escape the ~2-dispatch/slice chain.
        from ..ops.fused_step_odd_resident import (
            fused_multislice_odd_resident)
        return fused_multislice_odd_resident(psi, potential_szy, kxs, kys,
                                             sigma=sigma, lam=lam, dz=dz,
                                             ksq=ksq, kmax2=kmax2,
                                             tantilt=tantilt,
                                             record_layers=record_layers)
    if kernel == "odd":
        # Digit-split Pallas path for composite odd grids (fused_step_odd).
        from ..ops.fused_step_odd import fused_multislice_odd
        return fused_multislice_odd(psi, potential_szy, kxs, kys,
                                    sigma=sigma, lam=lam, dz=dz, ksq=ksq,
                                    kmax2=kmax2, tantilt=tantilt,
                                    record_layers=record_layers)
    # Scrambled-order FFT pairs (per axis): the k axes feeding the Fresnel
    # propagator are pre-permuted to the transform's digit-scrambled output
    # order — the diagonal multiply is order-agnostic, so the loop does the
    # exact same math with zero transposes (see ops.matfft scrambled docs).
    scr_x, scr_y = scrambled
    if ksq is not None:
        k2 = jnp.asarray(ksq, dtype=prec.real)
        if scr_x:
            k2 = k2[jnp.asarray(matfft.scramble_perm(psi.shape[-2]))]
        if scr_y:
            k2 = k2[:, jnp.asarray(matfft.scramble_perm(psi.shape[-1]))]
        phase = (-np.pi * lam * dz) * k2
        P = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    else:
        kxs_p = kxs[jnp.asarray(matfft.scramble_perm(psi.shape[-2]))] if scr_x else kxs
        kys_p = kys[jnp.asarray(matfft.scramble_perm(psi.shape[-1]))] if scr_y else kys
        k2 = (jnp.asarray(kxs_p, prec.real)[:, None] ** 2
              + jnp.asarray(kys_p, prec.real)[None, :] ** 2)
        P = fresnel_kernel(kxs_p, kys_p, lam, dz, prec)
    if tantilt is not None:
        # tilted propagator (pure phase): the wave advects laterally by
        # dz*tan(theta) each step — ksq is None here (checked at entry).
        tph = (2.0 * np.pi * dz) * (
            jnp.asarray(kxs_p, prec.real)[:, None] * tantilt[0]
            + jnp.asarray(kys_p, prec.real)[None, :] * tantilt[1])
        P = P * jax.lax.complex(jnp.cos(tph), jnp.sin(tph))
    if kmax2 is not None:
        # Antialiasing band limit folded into the per-step propagator
        # (zero-cost: one precomputed multiplier plane either way).
        P = P * (k2 <= kmax2).astype(prec.real)

    def loop_fft2(p):
        p = matfft.fft_scrambled(p, -1) if scr_y else matfft.fft(p, axis=-1)
        p = matfft.fft_scrambled(p, -2) if scr_x else matfft.fft(p, axis=-2)
        return p

    def loop_ifft2(p):
        p = matfft.ifft_scrambled(p, -2) if scr_x else matfft.ifft(p, axis=-2)
        p = matfft.ifft_scrambled(p, -1) if scr_y else matfft.ifft(p, axis=-1)
        return p

    # Under shard_map, psi (probe-sharded) and the potential (frame-sharded)
    # carry different device-varying annotations; the scan carry must hold
    # their union from step 0, so fold a zero contribution of the potential
    # into psi before scanning.
    psi = psi + (jnp.sum(potential_szy) * 0).astype(prec.complex)

    def transmit(p, v_slice):
        return transmission(v_slice, sigma, prec) * p

    def step(p, v_slice):
        # transmit + Fresnel step (used for every slice except the last).
        # FFTs dispatch to the MXU matmul-FFT for non-power-of-two sizes on
        # TPU (ops.matfft) — 2-5x faster than XLA's FFT there.
        p = transmit(p, v_slice)
        p = loop_ifft2(P * loop_fft2(p))
        return p

    if record_layers is None:
        if nz > 1:
            def body(p, v_slice):
                return step(p, v_slice), None
            psi, _ = jax.lax.scan(body, psi, potential_szy[:-1])
        return transmit(psi, potential_szy[-1])

    snapshots = []
    z = 0
    for layer in layers:
        # Propagate through slices [z, layer): full transmit+Fresnel steps.
        if layer > z:
            def body(p, v_slice):
                return step(p, v_slice), None
            psi, _ = jax.lax.scan(body, psi, potential_szy[z:layer])
        # Snapshot = wave after transmitting slice `layer` (no Fresnel yet).
        snap = transmit(psi, potential_szy[layer])
        snapshots.append(snap)
        # Continue: the running wave gets the Fresnel step unless `layer`
        # is the final slice (skip-last rule).
        if layer < nz - 1:
            psi = loop_ifft2(P * loop_fft2(snap))
        z = layer + 1
    return jnp.stack(snapshots, axis=0)


def Propagate(probe, potential, device=None):
    """Reference-compatible facade (multislice.py:237-299).

    Accepts the Probe / Potential class facades, returns the exit wave with
    the reference's squeeze semantics: 2-D input -> 2-D output, batched input
    -> (n_probes, nx, ny). Does NOT mutate probe.array (reference bug #7).
    """
    del device
    prec = probe.precision
    psi = probe.array
    squeeze = psi.ndim == 2
    if squeeze:
        psi = psi[None]
    # Reference parity: Fresnel dz always comes from potential.zs spacing,
    # even for slice_axis != 2 (multislice.py:266 — callers permute grids).
    zs = np.asarray(potential.zs)
    dz = float(zs[1] - zs[0]) if len(zs) > 1 else 0.5
    out = multislice(psi, potential.array_szy,
                     potential.kxs, potential.kys,
                     eV=probe.eV, lam=probe.wavelength, dz=dz,
                     precision=prec)
    return out[0] if squeeze else out

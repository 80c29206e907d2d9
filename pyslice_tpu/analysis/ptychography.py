"""Ptychographic phase reconstruction from 4D-STEM data.

Beyond-reference analysis family (the reference ships only HAADF over its
WFData 4D datasets, /root/reference/src/postprocessing/haadf_data.py): the
(probes, kx, ky) exit-wave intensities the pipeline already produces ARE a
4D-STEM/ptychography dataset, and these routines invert them for the
specimen's phase:

* ``scan_grid_data``   — WFData -> (scan_xs, scan_ys, I(sx, sy, kx, ky)),
  the frame-averaged CBED stack on the rectangular scan grid;
* ``ssb_reconstruct``  — single-sideband ptychography (Rodenburg & Bates
  1992; Pennycook et al., Ultramicroscopy 151 (2015) 160): direct,
  non-iterative weak-phase reconstruction from the trotter overlaps of
  G(Q, kf) = FFT_scan[I];
* ``epie_reconstruct`` — ePIE (Maiden & Rodenburg, Ultramicroscopy 109
  (2009) 1256): iterative object (and optionally probe) retrieval. The
  whole solver is ONE jitted program — lax.scan over scan positions inside
  lax.scan over iterations — with probe shifts applied as exact k-space
  phase ramps (no dynamic-shape windowing, so XLA compiles a single static
  kernel and the MXU-backed matmul-FFTs carry the transforms);
* ``icom_reconstruct`` — integrated center of mass (iCoM / iDPC; Lazic
  et al., Ultramicroscopy 160 (2016) 265): Fourier integration of the
  first-moment deflection field into a quantitative probe-blurred phase
  map — the cheapest member of the family (two scan-grid FFTs).

Conventions: detector axes arrive fftshifted + monotonic (the WFData
layout); reconstruction internals run in natural FFT order on device.
Complex results cross the host boundary through utils.host.to_numpy
(split-transfer; complex buffers cannot cross the axon PJRT layer).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import get_precision
from ..ops import matfft
from ..utils.host import to_device_complex, to_numpy
from .detectors import _scan_grid


def scan_grid_data(wf_data, layer_index: int = -1):
    """Arrange a WFData as a 4D-STEM dataset on its rectangular scan grid.

    Returns ``(scan_xs, scan_ys, data4d)`` with ``data4d`` of shape
    (n_sx, n_sy, nkx, nky): frame-averaged detector intensity per scan
    point (nearest probe per unique-x/unique-y point, the same scan-grid
    reconstruction HAADFData.calculateADF uses). Device-resident WFData
    reduces on device; the returned stack is a host array.
    """
    wf = wf_data.wavefunction_data
    from ..parallel.sharded import (frame_mean_intensity_sharded,
                                    sharded_mesh_of)
    mesh = sharded_mesh_of(wf)
    if mesh is not None:
        # Multi-host-safe: shard_map reduction, replicated result
        # (scan_grid_data returns a full host array by contract).
        inten = np.asarray(jax.device_get(
            frame_mean_intensity_sharded(wf, mesh, layer_index=layer_index)))
    else:
        xp = jnp if isinstance(wf, jax.Array) else np
        inten = np.asarray(
            xp.mean(xp.abs(wf[:, :, :, :, layer_index]) ** 2, axis=1))
    xs, ys, nearest = _scan_grid(wf_data.probe_positions)
    data4d = inten[nearest].reshape(len(xs), len(ys), *inten.shape[-2:])
    return xs, ys, data4d


def _precision_of(rdtype):
    """Precision policy matching a real dtype (f64 -> DOUBLE else SINGLE)."""
    from ..core.dtypes import DOUBLE, SINGLE
    return DOUBLE if np.dtype(rdtype) == np.float64 else SINGLE


def _detector_amplitudes(data4d) -> np.ndarray:
    """(N, nkx, nky) fftshifted intensities -> natural-order amplitudes."""
    return np.sqrt(np.maximum(
        np.fft.ifftshift(np.asarray(data4d), axes=(-2, -1)), 0.0))


def _epoch_batches(npos: int, nb: int, steps: int, seed: int) -> np.ndarray:
    """(steps, nb) minibatch indices: shuffled epochs — every position
    visited once per ceil(npos/nb) steps."""
    rng = np.random.default_rng(seed)
    batches = np.empty((steps, nb), np.int32)
    perm, used = rng.permutation(npos), 0
    for s in range(steps):
        if used + nb > npos:
            perm, used = rng.permutation(npos), 0
        batches[s] = perm[used:used + nb]
        used += nb
    return batches


def _shift_ramps(kx, ky, pos_b):
    """exp(2 pi i k.pos) k-space shift ramps, (nb, nx, ny) — the
    quirk-#14 sign convention shared by every solver here (matches
    physics.probe.shift_probes)."""
    ph = (2.0 * np.pi) * (kx[:, None] * pos_b[:, 0, None, None]
                          + ky[None, :] * pos_b[:, 1, None, None])
    return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))


def _probe_center(probe) -> Tuple[float, float]:
    """Real-space peak of the UNSHIFTED base probe. probe_array's
    ifftshift puts the peak at index n - n//2 = (n+1)//2, which differs
    from n//2 exactly on odd grids (same geometry as the PRISM window
    centering, engine/smatrix._window_starts)."""
    nx, ny = len(probe.xs), len(probe.ys)
    return (float(probe.xs[(nx + 1) // 2]), float(probe.ys[(ny + 1) // 2]))


def _uniform_step(axis, name: str) -> float:
    axis = np.asarray(axis, dtype=np.float64)
    if len(axis) < 2:
        raise ValueError(f"{name} needs >= 2 scan points")
    steps = np.diff(axis)
    if not np.allclose(steps, steps[0], rtol=1e-6, atol=1e-9):
        raise ValueError(f"{name} must be uniformly spaced for the scan FFT")
    return float(steps[0])


@functools.partial(jax.jit, static_argnames=("kmax",))
def _ssb_trotters(g_chunk, q_chunk, kx2d, ky2d, kmax: float):
    """Single-sideband trotter sums for a chunk of scan frequencies.

    g_chunk: (c, nkx, nky) complex G(Q, kf); q_chunk: (c, 2) scan
    frequencies (1/A). Returns (c,) complex means over the double-overlap
    region A(kf) & A(kf + Q) & ~A(kf - Q).

    Geometry note: this framework's scan convention (shift_probes, the
    reference's quirk #14) places the probe listed at R physically at
    c - R (c = the base probe's center). Under the scan FFT that reverses
    the position axis, so the weak-phase expansion of |FT psi_exit|^2
    puts the conjugated object spectrum on the A(kf+Q) sideband:
    G(Q, kf) = i * conj(Phi)(Q) * e^{-2 pi i Q.c} * N_scan there (ideal
    aperture). The caller removes the probe-center phase.
    """
    k2 = kmax * kmax

    def one(g, q):
        a0 = (kx2d ** 2 + ky2d ** 2) <= k2
        am = ((kx2d - q[0]) ** 2 + (ky2d - q[1]) ** 2) <= k2
        ap = ((kx2d + q[0]) ** 2 + (ky2d + q[1]) ** 2) <= k2
        band = a0 & ap & jnp.logical_not(am)
        cnt = jnp.sum(band)
        val = jnp.sum(jnp.where(band, g, 0.0 + 0.0j))
        return val / jnp.maximum(cnt, 1).astype(val.real.dtype), cnt

    return jax.vmap(one)(g_chunk, q_chunk)


def ssb_reconstruct(data4d, scan_xs, scan_ys, kxs, kys,
                    mrad: Optional[float] = None,
                    eV: Optional[float] = None, probe=None,
                    probe_center: Optional[Tuple[float, float]] = None,
                    q_chunk: int = 1024) -> dict:
    """Single-sideband ptychography: direct weak-phase reconstruction.

    Args:
        data4d: (n_sx, n_sy, nkx, nky) detector intensities on the scan
            grid (``scan_grid_data`` output; detector axes fftshifted).
        scan_xs/scan_ys: uniform scan-point coordinates (Angstrom).
        kxs/kys: detector axes, 1/Angstrom, fftshifted monotonic
            (WFData.kxs/kys).
        mrad/eV: probe aperture semi-angle and beam energy (must match
            the probes that recorded ``data4d`` — the trotter geometry
            is the aperture's). Default from ``probe`` when given.
        probe: optional ``Probe`` — supplies mrad/eV/probe_center
            (pass ``wf_data.probe`` alongside ``scan_grid_data`` output).
        probe_center: real-space center (Angstrom) of the UNSHIFTED base
            probe. This framework's probes are built at the cell center
            (probe_array's ifftshift) and scanned with the reference's
            shift sign (quirk #14: listed R -> physical c - R); the
            resulting e^{-2 pi i Q.c} phase must be removed or the
            reconstruction is circularly translated by c. Default: taken
            from ``probe``, else (0, 0).
        q_chunk: scan-frequency bins processed per device dispatch.

    Returns dict with ``phase`` (n_sx, n_sy float, the reconstructed
    object phase at the scan coordinates — QUANTITATIVE, in radians
    within the weak-phase approximation, mean-free), ``qxs``/``qys``
    (scan-frequency axes), and ``trotter_pixels`` (n_sx, n_sy int — 0
    marks frequencies outside the double-overlap band |Q| in (0, 2 k_ap),
    which carry no signal). Resolution is aperture-limited (|Q| <
    2 alpha / lambda), the standard SSB band; the scan Nyquist
    1/(2*step) should exceed it or the band is clipped.
    """
    from ..core.constants import wavelength

    if probe is not None:
        mrad = probe.mrad if mrad is None else mrad
        eV = probe.eV if eV is None else eV
        if probe_center is None:
            probe_center = _probe_center(probe)
    if mrad is None or eV is None:
        raise ValueError("pass mrad and eV (or a probe)")
    if probe_center is None:
        probe_center = (0.0, 0.0)

    data4d = np.asarray(data4d)
    n_sx, n_sy = data4d.shape[:2]
    dx = _uniform_step(scan_xs, "scan_xs")
    dy = _uniform_step(scan_ys, "scan_ys")
    qxs = np.fft.fftfreq(n_sx, d=dx)
    qys = np.fft.fftfreq(n_sy, d=dy)
    kmax = (mrad * 1e-3) / wavelength(eV)

    # G(Q, kf): FFT over the scan axes only. Host FFT — the scan grid is
    # small next to the detector axes and the result feeds device chunks.
    g = np.fft.fft2(data4d, axes=(0, 1))
    g = g.reshape(n_sx * n_sy, *data4d.shape[2:])
    qgrid = np.stack(np.meshgrid(qxs, qys, indexing="ij"),
                     axis=-1).reshape(-1, 2)

    prec = get_precision("single")
    kx2d = jnp.asarray(np.asarray(kxs, np.float64)[:, None],
                       dtype=prec.real)
    ky2d = jnp.asarray(np.asarray(kys, np.float64)[None, :],
                       dtype=prec.real)

    vals = np.zeros(n_sx * n_sy, dtype=np.complex128)
    cnts = np.zeros(n_sx * n_sy, dtype=np.int64)
    for i in range(0, len(qgrid), q_chunk):
        gc = to_device_complex(g[i:i + q_chunk], prec.complex)
        qc = jnp.asarray(qgrid[i:i + q_chunk].astype(np.float32))
        v, c = _ssb_trotters(gc, qc, kx2d, ky2d, float(kmax))
        vals[i:i + q_chunk] = to_numpy(v)
        cnts[i:i + q_chunk] = np.asarray(c)

    # est(Q) = i * conj(Phi)(Q) * e^{-2 pi i Q.c}  =>
    # Phi(Q) = conj(est / i) * e^{-2 pi i Q.c}
    # (see _ssb_trotters' geometry note for the sideband derivation).
    qdotc = (qgrid[:, 0] * probe_center[0]
             + qgrid[:, 1] * probe_center[1])
    phi_q = (np.conj(vals / 1j)
             * np.exp(-2j * np.pi * qdotc)).reshape(n_sx, n_sy)
    phase = np.real(np.fft.ifft2(phi_q))
    return dict(phase=phase, qxs=qxs, qys=qys,
                trotter_pixels=cnts.reshape(n_sx, n_sy))


def icom_reconstruct(data4d, scan_xs, scan_ys, kxs, kys, probe=None,
                     probe_center: Optional[Tuple[float, float]] = None,
                     com=None) -> dict:
    """Integrated center of mass (iCoM / iDPC) phase reconstruction.

    For a (weak) phase object the diffraction pattern's first moment is
    the probe-intensity-blurred phase gradient — the CoM theorem,
    <k> = (1/2pi) grad phi_blur at the PHYSICAL probe position. Under
    this framework's scan convention (listed R -> physical c - R, quirk
    #14; verified numerically to r=1.000 against the spectral gradient
    of the blurred truth) the measured field over the scan grid is
    M(R) = (1/2pi)(grad phi_blur)(c - R). Fourier integration recovers
    h(R) = phi_blur(c - R); a conjugate + probe-center phase ramp folds
    the reflection back so the output is phi_blur at the LISTED scan
    coordinates — the same frame ``ssb_reconstruct`` reports. No
    trotters, no iterations; two scan-grid FFTs total.

    Args:
        data4d: (n_sx, n_sy, nkx, nky) detector intensities on the scan
            grid (``scan_grid_data`` output).
        scan_xs/scan_ys: uniform scan coordinates (Angstrom).
        kxs/kys: detector axes, 1/Angstrom, fftshifted monotonic
            (WFData.kxs/kys).
        probe: optional ``Probe`` — supplies ``probe_center``.
        probe_center: real-space center (Angstrom) of the unshifted base
            probe (see ``ssb_reconstruct``). Default: from ``probe``,
            else (0, 0) — wrong center circularly translates + reflects
            the map but does not corrupt it.
        com: optional precomputed/CALIBRATED (2, n_sx, n_sy) deflection
            field in 1/Angstrom (``analysis.calibration`` output) —
            overrides the moments computed from ``data4d`` (which may then
            be None).

    Returns dict with ``phase`` (n_sx, n_sy float, radians — QUANTITATIVE
    for a weak phase object up to the probe-intensity blur A/integral(A);
    compare against truth convolved with that kernel, not raw truth),
    ``com`` (2, n_sx, n_sy — the kx/ky first-moment field, 1/Angstrom),
    and ``curl_rms`` (RMS of the deflection field's discrete curl over
    its RMS gradient — a conservativeness diagnostic; large values mean
    the weak-phase/thin-object assumptions are failing and the phase map
    is untrustworthy). The DC (mean) phase is unrecoverable and set to 0.
    """
    if probe is not None and probe_center is None:
        probe_center = _probe_center(probe)
    if probe_center is None:
        probe_center = (0.0, 0.0)

    dx = _uniform_step(scan_xs, "scan_xs")
    dy = _uniform_step(scan_ys, "scan_ys")

    if com is not None:
        # Calibrated field override (analysis.calibration): rotation/
        # descan corrections live on the CoM FIELD — pattern-level
        # resampling would swamp sub-pixel deflection signals.
        com = np.asarray(com, np.float64)
        comx, comy = com[0], com[1]
        n_sx, n_sy = comx.shape
    else:
        data4d = np.asarray(data4d, dtype=np.float64)
        n_sx, n_sy = data4d.shape[:2]
        kx = np.asarray(kxs, np.float64)[:, None]
        ky = np.asarray(kys, np.float64)[None, :]
        # Zero-total frames (a low-dose scan position that caught no
        # counts) must not NaN-poison the whole map: their deflection is
        # defined 0.
        total = data4d.sum(axis=(-2, -1))
        safe = np.where(total > 0, total, 1.0)
        comx = np.where(total > 0,
                        (data4d * kx).sum(axis=(-2, -1)) / safe, 0.0)
        comy = np.where(total > 0,
                        (data4d * ky).sum(axis=(-2, -1)) / safe, 0.0)

    qx = np.fft.fftfreq(n_sx, d=dx)[:, None]
    qy = np.fft.fftfreq(n_sy, d=dy)[None, :]
    q2 = qx ** 2 + qy ** 2
    mx = np.fft.fft2(comx)
    my = np.fft.fft2(comy)
    # h(R) = phi_blur(c - R): grad_R h = -(grad phi_blur)(c-R) = -2pi M
    # =>  M^ = -i Q h^  =>  h^ = i (Q . M^) / |Q|^2  (DC unrecoverable).
    with np.errstate(divide="ignore", invalid="ignore"):
        h_hat = 1j * (qx * mx + qy * my) / q2
    h_hat[0, 0] = 0.0
    # undo the scan reflection: phase(R) = h(c - R), i.e.
    # phase^(Q) = e^{-2 pi i Q.c} conj(h^(Q)) for real h.
    qdotc = qx * probe_center[0] + qy * probe_center[1]
    phase_hat = np.exp(-2j * np.pi * qdotc) * np.conj(h_hat)
    phase = np.real(np.fft.ifft2(phase_hat))

    # curl diagnostic: d(comy)/dx - d(comx)/dy should vanish for a
    # conservative (gradient) field. Spectral derivatives, same grid.
    curl = np.real(np.fft.ifft2(2j * np.pi * (qx * my - qy * mx)))
    grad_mag = np.sqrt(np.mean(
        np.real(np.fft.ifft2(2j * np.pi * qx * mx)) ** 2
        + np.real(np.fft.ifft2(2j * np.pi * qy * my)) ** 2))
    curl_rms = float(np.sqrt(np.mean(curl ** 2)) / (grad_mag + 1e-30))
    return dict(phase=phase, com=np.stack([comx, comy], axis=0),
                curl_rms=curl_rms)


@functools.partial(
    jax.jit, static_argnames=("n_iters", "update_probe"))
def _epie_run(amps, positions, obj0, probe0, kx, ky, alpha, beta,
              n_iters: int, update_probe: bool):
    """The whole ePIE solve as one compiled program.

    amps: (npos, nx, ny) measured detector AMPLITUDES, natural FFT order.
    positions: (npos, 2) Angstrom. kx/ky: natural-order axes (1/A).
    Carry = (object, probe) on the full grid; probe shifts are exact
    k-space phase ramps so every step has static shapes. The ramp sign
    matches physics.probe.shift_probes (the reference's quirk #14), so a
    probe guess equal to the data's true illumination is exactly
    self-consistent and the recovered object is in physical coordinates.
    """
    two_pi = 2.0 * np.pi

    def ramp_for(pos):
        ph = two_pi * (kx[:, None] * pos[0] + ky[None, :] * pos[1])
        return jax.lax.complex(jnp.cos(ph), jnp.sin(ph))

    def one_pos(carry, inputs):
        obj, probe = carry
        a_j, pos = inputs
        ramp = ramp_for(pos)
        p_j = matfft.ifft2(matfft.fft2(probe) * ramp)
        psi = p_j * obj
        big = matfft.fft2(psi)
        mag = jnp.abs(big)
        err = jnp.mean((mag - a_j) ** 2)
        psi2 = matfft.ifft2(big * (a_j / (mag + 1e-12)))
        d = psi2 - psi
        obj_new = obj + alpha * jnp.conj(p_j) * d \
            / jnp.max(jnp.abs(p_j) ** 2)
        if update_probe:
            p_new = p_j + beta * jnp.conj(obj) * d \
                / jnp.max(jnp.abs(obj) ** 2)
            probe = matfft.ifft2(matfft.fft2(p_new) * jnp.conj(ramp))
        return (obj_new, probe), err

    def one_iter(carry, _):
        carry, errs = jax.lax.scan(one_pos, carry, (amps, positions))
        return carry, jnp.mean(errs)

    (obj, probe), losses = jax.lax.scan(one_iter, (obj0, probe0), None,
                                        length=n_iters)
    return obj, probe, losses


def epie_reconstruct(data4d, probe_positions, probe, n_iters: int = 50,
                     alpha: float = 0.2, beta: float = 0.2,
                     update_probe: bool = True,
                     obj_init=None) -> dict:
    """ePIE object (and probe) retrieval from intensity-only 4D-STEM data.

    Args:
        data4d: (npos, nkx, nky) detector intensities, fftshifted (the
            WFData k layout; flatten ``scan_grid_data``'s first two axes
            or pass per-probe frames directly).
        probe_positions: (npos, 2) scan coordinates, Angstrom.
        probe: the illumination ``Probe`` (its array is the real-space
            initial guess; its kxs/kys supply the shift ramps).
        n_iters: full sweeps over the scan.
        alpha/beta: object/probe update strengths (Maiden & Rodenburg's
            notation).
        update_probe: False freezes the probe (PIE) — e.g. when the
            illumination is known exactly, as for simulated data.
        obj_init: optional (nx, ny) complex initial object (default: 1).

    Returns dict with ``object`` (nx, ny complex, full-resolution),
    ``probe`` (nx, ny complex, the refined illumination), and ``losses``
    (n_iters, detector-amplitude MSE per sweep). The usual ptychographic
    ambiguities apply: a global phase offset, and (with update_probe) a
    complex-scale split between object and probe.
    """
    prec = probe.precision
    data = np.asarray(data4d)
    npos = data.shape[0]
    if np.asarray(probe_positions).shape[0] != npos:
        raise ValueError(
            f"data4d has {npos} patterns but probe_positions has "
            f"{np.asarray(probe_positions).shape[0]} entries")
    amps = np.sqrt(np.maximum(np.fft.ifftshift(data, axes=(-2, -1)), 0.0))

    p0 = probe.array
    if p0.ndim != 2:
        raise ValueError("probe must be a single (nx, ny) Probe, "
                         "not a batch")
    # jit the ones so the complex constant materializes on device (the
    # axon PJRT layer cannot transfer complex host buffers).
    obj0 = (jax.jit(lambda: jnp.ones(p0.shape, dtype=prec.complex))()
            if obj_init is None
            else to_device_complex(np.asarray(obj_init), prec.complex))

    obj, pr, losses = _epie_run(
        jnp.asarray(amps.astype(np.dtype(prec.real))),
        jnp.asarray(np.asarray(probe_positions, np.float64)
                    .astype(np.dtype(prec.real))),
        obj0, p0,
        jnp.asarray(probe.kxs.astype(np.dtype(prec.real))),
        jnp.asarray(probe.kys.astype(np.dtype(prec.real))),
        np.dtype(prec.real).type(alpha), np.dtype(prec.real).type(beta),
        int(n_iters), bool(update_probe))
    return dict(object=to_numpy(obj), probe=to_numpy(pr),
                losses=np.asarray(losses))


@functools.partial(jax.jit, static_argnames=("lr_v", "lr_probe", "lr_pos",
                                              "eV", "dz", "update_probe",
                                              "update_positions", "mesh",
                                              "loss", "reg_tv"))
def _msp_run(amps, positions, batches, v0, probe0, kx, ky, *, lr_v, lr_probe,
             lr_pos, eV: float, dz: float, update_probe: bool,
             update_positions: bool, mesh=None, loss: str = "amplitude",
             reg_tv: float = 0.0):
    """The whole multislice-ptychography solve as one compiled program.

    Carry = (V, probe, optimizer state); one lax.scan step = one Adam
    update on a minibatch of scan positions. The forward model per
    position is the PRODUCTION multislice (via the O(1)-memory adjoint,
    physics/adjoint.py — no per-slice residuals, fused Pallas kernels on
    TPU), with probe shifts as exact k-space phase ramps (quirk-#14 sign,
    identical to _epie_run) so the recovered potential sits in physical
    coordinates.
    """
    import optax

    from ..physics.adjoint import multislice_diff

    rdtype = v0.dtype
    prec = _precision_of(rdtype)

    def shifted(probe_modes, pos):
        # probe_modes: (K, nx, ny); pos: (nb, 2) -> (nb, K, nx, ny)
        ramp = _shift_ramps(kx, ky, pos)
        return matfft.ifft2(matfft.fft2(probe_modes)[None]
                            * ramp[:, None])

    def batch_loss(params, a_b, idx):
        pos_b = jnp.take(params["pos"], idx, axis=0)
        psi_b = shifted(params["probe"], pos_b)       # (nb, K, nx, ny)
        nb_l, k_modes = psi_b.shape[0], psi_b.shape[1]
        exit_b = multislice_diff(
            psi_b.reshape(nb_l * k_modes, *psi_b.shape[2:]),
            params["v"], kx, ky, eV=eV, dz=dz, precision=prec)
        inten = jnp.abs(matfft.fft2(exit_b)) ** 2
        # mutually INCOHERENT modes: intensities add (mixed-state probe)
        inten = inten.reshape(nb_l, k_modes, *inten.shape[1:]).sum(axis=1)
        if loss == "poisson":
            # Poisson NLL (up to the model-free log I! term): correct
            # data fidelity for counting noise at finite dose. The log
            # floor must live on the COUNT scale (a fixed tiny eps lets
            # n/I explode on dark pixels that caught a stray count).
            i_meas = a_b ** 2
            floor = jax.lax.stop_gradient(1e-3 * jnp.mean(i_meas))
            fit = jnp.mean(inten - i_meas * jnp.log(inten + floor))
        else:
            mag = jnp.sqrt(inten + 1e-24)
            fit = jnp.mean((mag - a_b) ** 2)
        if reg_tv > 0.0:
            # isotropic smoothed total variation over each slice of V —
            # the standard edge-preserving prior for noisy data.
            dvx = jnp.diff(params["v"], axis=-2)
            dvy = jnp.diff(params["v"], axis=-1)
            tv = jnp.mean(jnp.sqrt(dvx[..., :, :-1] ** 2
                                   + dvy[..., :-1, :] ** 2 + 1e-12))
            fit = fit + reg_tv * tv
        return fit

    if mesh is None:
        value_grad = jax.value_and_grad(batch_loss)
    else:
        # Data-parallel over ALL mesh devices: the minibatch axis shards
        # across the flattened mesh; params stay replicated and the
        # per-device gradients pmean back (equal local batch sizes make
        # the pmean of local-mean gradients the exact global-mean
        # gradient). The adjoint forward/backward is embarrassingly
        # parallel over scan positions — zero communication until the
        # one gradient reduction per step.
        from jax.sharding import PartitionSpec as P
        axes = tuple(mesh.axis_names)

        @functools.partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(), P(axes), P(axes)), out_specs=(P(), P()))
        def value_grad(params, a_b, idx):
            val, g = jax.value_and_grad(batch_loss)(params, a_b, idx)
            val = jax.lax.pmean(val, axes)
            g = jax.tree_util.tree_map(
                lambda x: jax.lax.pmean(x, axes), g)
            return val, g

    label = {"v": "v", "probe": "probe", "pos": "pos"}
    opt = optax.multi_transform(
        {"v": optax.adam(lr_v),
         "probe": optax.adam(lr_probe) if update_probe
         else optax.set_to_zero(),
         "pos": optax.adam(lr_pos) if update_positions
         else optax.set_to_zero()},
        label)
    params = {"v": v0, "probe": probe0, "pos": positions}
    state = opt.init(params)

    def one_step(carry, idx):
        params, state = carry
        a_b = jnp.take(amps, idx, axis=0)
        val, g = value_grad(params, a_b, idx)
        # jax.grad of a real loss w.r.t. a COMPLEX parameter returns the
        # Wirtinger d/dz-bar conjugate: steepest descent needs conj(g)
        # (the potential is real — unaffected).
        g = {"v": g["v"], "probe": jnp.conj(g["probe"]), "pos": g["pos"]}
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
        return (params, state), val.astype(rdtype)

    (params, _), losses = jax.lax.scan(one_step, (params, state), batches)
    return params["v"], params["probe"], params["pos"], losses


def msp_reconstruct(data4d, probe_positions, probe, n_slices: int,
                    dz: float, steps: int = 300, batch: Optional[int] = None,
                    lr: float = 30.0, lr_probe: float = 2e-3,
                    lr_pos: float = 0.01,
                    update_probe: bool = False,
                    update_positions: bool = False, v_init=None,
                    seed: int = 0, mesh=None, n_modes: int = 1,
                    probe_modes=None, loss: str = "amplitude",
                    reg_tv: float = 0.0) -> dict:
    """Multislice electron ptychography: recover a DEPTH-RESOLVED
    potential (and optionally the probe) from intensity-only 4D-STEM data.

    Where ``epie_reconstruct`` retrieves a single 2-D transmission object,
    this inverts the full multislice forward model — Adam descent on the
    detector-amplitude MSE, differentiated through the slice loop with the
    O(1)-memory unitary adjoint (physics/adjoint.py) so depth and grid
    size are limited by the forward pass, not by autodiff residuals.
    (The reference has no inverse capability at all; cf. the multislice
    ptychography of Chen et al., Science 372 (2021) 826.)

    Args:
        data4d: (npos, nkx, nky) detector intensities, fftshifted (the
            WFData k layout — same convention as epie_reconstruct).
        probe_positions: (npos, 2) scan coordinates, Angstrom.
        probe: the illumination ``Probe`` (initial guess; supplies the
            grid, energy, and shift ramps).
        n_slices: number of potential slices to recover.
        dz: slice spacing, Angstrom (n_slices * dz = specimen thickness).
        steps: Adam steps.
        batch: minibatch size over scan positions (None = full batch).
        lr: Adam learning rate for the potential (volt-Angstrom scale).
        lr_probe: Adam learning rate for the probe (used when
            ``update_probe``).
        lr_pos: Adam learning rate for scan positions, Angstrom (used
            when ``update_positions``; positions jitter is usually
            sub-pixel, so keep this well below the pixel pitch).
        update_probe: also refine the illumination (joint recovery).
        update_positions: also refine the scan positions — corrects the
            sub-pixel scan jitter real instruments always have. The
            positions enter the forward model only through the k-space
            shift ramps exp(2 pi i k.pos), so their gradients cost
            nothing extra.
        v_init: optional (n_slices, nx, ny) initial potential (default 0).
        seed: minibatch shuffling seed.
        mesh: optional ``jax.sharding.Mesh`` (e.g. ``parallel.make_mesh()``)
            — shards every minibatch over ALL mesh devices (data-parallel
            positions; one gradient pmean per step). The minibatch size
            must divide by the device count.
        n_modes: MIXED-STATE probe: number of mutually incoherent probe
            modes (partial spatial coherence — Thibault & Menzel, Nature
            494 (2013) 68). Mode 0 starts at ``probe``; extra modes start
            as weak Hermite-like sidebands of it (10% amplitude, x/y
            gradient envelopes) and are refined when ``update_probe``.
            Intensities of the modes ADD on the detector. Note the modes
            are NOT re-orthogonalized during descent (only their
            incoherent sum is observable, so overlapping modes cost
            interpretability, not fit quality); orthogonalize with
            np.linalg.qr on the returned ``probe_modes`` if you need the
            canonical decomposition.
        probe_modes: optional explicit (K, nx, ny) complex initial modes
            (overrides ``n_modes``/the probe-derived initialization).
        loss: data fidelity — "amplitude" (detector-amplitude MSE, the
            ePIE-style default; near-optimal variance stabilization for
            counting noise) or "poisson" (exact Poisson negative
            log-likelihood for low-dose counted data; pass data4d in
            COUNTS).
        reg_tv: weight of an isotropic (smoothed) total-variation prior
            on each potential slice — edge-preserving smoothing for
            noisy/low-dose data. 0 disables.

    Returns dict with ``potential`` (n_slices, nx, ny real), ``probe``
    (nx, ny complex — the dominant mode), ``probe_modes`` ((K, nx, ny)
    complex), ``positions`` ((npos, 2), refined when
    ``update_positions`` else the input), ``losses`` (steps,).
    Ambiguities: intensity data cannot fix a per-slice constant (a global
    phase), per-slice ambiguity, a rigid translation splits between object
    and positions, and depth resolution is bounded by the probe's depth of
    focus (~lambda/alpha^2).
    """
    prec = probe.precision
    data = np.asarray(data4d)
    npos = data.shape[0]
    positions = np.asarray(probe_positions, np.float64)
    if positions.shape[0] != npos:
        raise ValueError(
            f"data4d has {npos} patterns but probe_positions has "
            f"{positions.shape[0]} entries")
    if n_slices < 1:
        raise ValueError(f"n_slices must be >= 1, got {n_slices}")
    if loss not in ("amplitude", "poisson"):
        raise ValueError(f"loss must be 'amplitude' or 'poisson', "
                         f"got {loss!r}")
    p0 = probe.array
    if p0.ndim != 2:
        raise ValueError("probe must be a single (nx, ny) Probe, "
                         "not a batch")
    if probe_modes is not None:
        modes0 = to_device_complex(np.asarray(probe_modes), prec.complex)
        if modes0.ndim != 3 or modes0.shape[1:] != tuple(p0.shape):
            raise ValueError(
                f"probe_modes must be (K, {p0.shape[0]}, {p0.shape[1]})")
    elif n_modes > 1:
        # Hermite-like sidebands: mode 0 = the probe; mode j = probe
        # times a centered x/y gradient envelope at 10% amplitude —
        # linearly independent seeds for the mixed-state refinement.
        xs_c = np.asarray(probe.xs) - np.mean(probe.xs)
        ys_c = np.asarray(probe.ys) - np.mean(probe.ys)
        envs = []
        for j in range(1, n_modes):
            axis = (xs_c[:, None] if j % 2 else ys_c[None, :])
            axis = axis / (np.abs(axis).max() + 1e-30)
            env = 0.1 * axis ** ((j + 1) // 2) * np.ones(p0.shape)
            envs.append(jnp.asarray(env.astype(np.dtype(prec.real))))
        modes0 = jnp.concatenate([p0[None]]
                                 + [p0[None] * e for e in envs], axis=0)
    else:
        modes0 = jnp.asarray(p0)[None]
    amps = _detector_amplitudes(data)

    nb = npos if batch is None else int(min(batch, npos))
    if mesh is not None and nb % mesh.size != 0:
        raise ValueError(
            f"minibatch size {nb} must divide by the mesh's {mesh.size} "
            "devices (pass batch=...)")
    batches = _epoch_batches(npos, nb, steps, seed)

    rd = np.dtype(prec.real)
    if v_init is None:
        v0 = jnp.zeros((n_slices,) + p0.shape, dtype=rd)
    else:
        v0 = jnp.asarray(np.asarray(v_init), dtype=rd)
        if v0.shape != (n_slices,) + tuple(p0.shape):
            raise ValueError(f"v_init shape {v0.shape} != "
                             f"{(n_slices,) + tuple(p0.shape)}")

    v, pr, pos, losses = _msp_run(
        jnp.asarray(amps.astype(rd)), jnp.asarray(positions.astype(rd)),
        jnp.asarray(batches), v0, modes0,
        jnp.asarray(probe.kxs.astype(rd)), jnp.asarray(probe.kys.astype(rd)),
        lr_v=float(lr), lr_probe=float(lr_probe), lr_pos=float(lr_pos),
        eV=float(probe.eV), dz=float(dz),
        update_probe=bool(update_probe),
        update_positions=bool(update_positions), mesh=mesh,
        loss=str(loss), reg_tv=float(reg_tv))
    pr = to_numpy(pr)
    return dict(potential=np.asarray(v), probe=pr[0], probe_modes=pr,
                positions=np.asarray(pos), losses=np.asarray(losses))

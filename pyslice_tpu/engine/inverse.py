"""Inverse problems at the STRUCTURE level: refine atomic coordinates
against measured 4D-STEM data.

Where ``analysis.ptychography.msp_reconstruct`` recovers a free-form
voxel potential, this module keeps the PHYSICS parametrization — atoms
with tabulated Kirkland form factors — and descends directly on their
coordinates. The whole forward model is differentiable end to end:

    atom positions -> rasterize (structure-factor phase ramps are smooth
    in position; physics/potential.py) -> multislice (the O(1)-memory
    fused adjoint, physics/adjoint.py) -> detector amplitudes

so ``jax.grad`` of the data misfit w.r.t. the coordinates is exact, and
one Adam loop refines a perturbed structure model to the data. This is a
capability the reference cannot express at all (its rasterizer is a
Python loop over torch tensors with in-place indexing,
/root/reference/src/multislice/potentials.py:283-330).

Limitations, stated plainly: gradients are IN-PLANE only (the slice
binning of z is piecewise-constant, so dz gradients are zero — z
refinement would need a soft slice assignment); atoms must stay within
their planned (type, slice) buckets (the plan is static — give
``make_plan`` headroom via ``pad_fraction`` if a refinement step could
push an atom across a slice edge, and the rasterizer NaN-poisons any
uncovered frame rather than silently dropping it).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis.ptychography import (_detector_amplitudes, _epoch_batches,
                                     _precision_of, _shift_ramps)
from ..ops import matfft
from ..physics.adjoint import multislice_diff
from ..physics.potential import make_plan, rasterize


def _amplitude_misfit(psi_b, v, a_b, kx, ky, *, eV, dz, prec):
    """Detector-amplitude MSE of a probe batch through the multislice
    adjoint — the data-fidelity term every refinement here descends."""
    exit_b = multislice_diff(psi_b, v, kx, ky, eV=eV, dz=dz,
                             precision=prec)
    # Epsilon guard (same as _msp_run's amplitude loss): the complex-abs VJP
    # is NaN at exact zeros, and refine_aberrations starts from a zero
    # potential with a hard-apertured probe where only FFT roundoff keeps
    # detector pixels off exact zero.
    psi_k = matfft.fft2(exit_b)
    amp = jnp.sqrt(jnp.abs(psi_k) ** 2 + 1e-24)
    return jnp.mean((amp - a_b) ** 2)


@functools.partial(jax.jit, static_argnames=("plan", "eV", "dz", "lr"))
def _refine_run(amps, scan_pos, batches, pos0, probe0, kx, ky, *, plan,
                eV: float, dz: float, lr: float):
    import optax

    rdtype = jnp.asarray(pos0).dtype
    prec = _precision_of(rdtype)

    def batch_loss(atom_pos, a_b, idx):
        v = rasterize(atom_pos, plan, prec)
        ramps = _shift_ramps(kx, ky, jnp.take(scan_pos, idx, axis=0))
        psi_b = matfft.ifft2(matfft.fft2(probe0)[None] * ramps)
        return _amplitude_misfit(psi_b, v, a_b, kx, ky, eV=eV, dz=dz,
                                 prec=prec)

    opt = optax.adam(lr)
    state = opt.init(pos0)

    def one_step(carry, idx):
        pos, state = carry
        a_b = jnp.take(amps, idx, axis=0)
        val, g = jax.value_and_grad(batch_loss)(pos, a_b, idx)
        # z gradients are exactly zero through the slice binning, but
        # masking keeps Adam's moments from accumulating noise there.
        g = g * jnp.asarray([1.0, 1.0, 0.0], dtype=g.dtype)
        updates, state = opt.update(g, state)
        pos = optax.apply_updates(pos, updates)
        return (pos, state), val.astype(rdtype)

    (pos, _), losses = jax.lax.scan(one_step, (pos0, state), batches)
    return pos, losses


def refine_structure(data4d, scan_positions, probe, positions0, types,
                     zs, *, steps: int = 200,
                     batch: Optional[int] = None, lr: float = 5e-3,
                     seed: int = 0, pad_fraction: float = 0.5,
                     debye_waller=None) -> dict:
    """Refine atomic coordinates against intensity-only 4D-STEM data.

    Args:
        data4d: (npos, nkx, nky) measured detector intensities,
            fftshifted (the WFData k layout).
        scan_positions: (npos, 2) scan coordinates, Angstrom.
        probe: the illumination ``Probe`` (grid, energy, shift ramps).
        positions0: (n_atoms, 3) initial structure model, Angstrom.
        types: (n_atoms,) atomic numbers.
        zs: slice coordinates (the grid's z axis — e.g.
            ``calculator.spec.plan`` users pass ``grid.zs``).
        steps/batch/lr/seed: Adam schedule (lr in Angstrom — coordinate
            displacements are typically sub-0.1 A, keep lr ~ 1e-3..1e-2).
        pad_fraction: bucket-capacity headroom for the static plan.
        debye_waller: optional {element: B} static thermal damping.

    Returns dict with ``positions`` ((n_atoms, 3); z unchanged),
    ``displacement`` ((n_atoms,) |r - r0| in-plane), ``losses`` (steps,).
    """
    prec = probe.precision
    rd = np.dtype(prec.real)
    data = np.asarray(data4d)
    npos = data.shape[0]
    scan = np.asarray(scan_positions, np.float64)
    if scan.shape[0] != npos:
        raise ValueError(f"data4d has {npos} patterns but scan_positions "
                         f"has {scan.shape[0]}")
    pos0 = np.asarray(positions0, np.float64)
    p0 = probe.array
    if p0.ndim != 2:
        raise ValueError("probe must be a single (nx, ny) Probe")

    plan = make_plan(probe.xs, probe.ys, zs, pos0[None],
                     np.asarray(types, np.int32),
                     pad_fraction=pad_fraction, debye_waller=debye_waller)
    dz = float(zs[1] - zs[0]) if len(np.asarray(zs)) > 1 else 1.0

    amps = _detector_amplitudes(data)
    nb = npos if batch is None else int(min(batch, npos))
    batches = _epoch_batches(npos, nb, steps, seed)

    pos, losses = _refine_run(
        jnp.asarray(amps.astype(rd)), jnp.asarray(scan.astype(rd)),
        jnp.asarray(batches), jnp.asarray(pos0.astype(rd)), p0,
        jnp.asarray(probe.kxs.astype(rd)),
        jnp.asarray(probe.kys.astype(rd)),
        plan=plan, eV=float(probe.eV), dz=dz, lr=float(lr))
    pos = np.asarray(pos, np.float64)
    disp = np.hypot(pos[:, 0] - pos0[:, 0], pos[:, 1] - pos0[:, 1])
    return dict(positions=pos, displacement=disp,
                losses=np.asarray(losses))


# --- aberration-coefficient refinement ---------------------------------------

# anisotropic harmonics: name -> (azimuthal order m, radial builder index)
_ANISO_ORDER = {"A1": 2, "B2": 1, "A2": 3, "A3": 4}


def _aberration_basis(kxs, kys, lam: float, names, k_ap: float):
    """chi = sum_k c_k * term_k, each term matching physics.aberrations.
    chi_phase exactly; anisotropic names expand to Cartesian (a, b) pairs
    (X cos(m(phi-phi0)) = Xa cos(m phi) + Xb sin(m phi)). Terms are
    normalized to unit centered RMS inside the aperture so one Adam rate
    fits coefficients whose physical scales span ~10 orders of magnitude
    (C1 ~ 10 A vs C5 ~ 1e8 A); ``scales`` converts back
    (phys = fitted / scale)."""
    kx2d = np.asarray(kxs, np.float64)[:, None] * np.ones(len(kys))[None, :]
    ky2d = np.ones(len(kxs))[:, None] * np.asarray(kys, np.float64)[None, :]
    q2 = kx2d ** 2 + ky2d ** 2
    phi = np.arctan2(ky2d, kx2d)
    l2 = lam * lam
    radial = {
        "C1": np.pi * lam * q2,
        "C3": 0.5 * np.pi * lam * l2 * q2 * q2,
        "C5": np.pi / 3.0 * lam * l2 * l2 * q2 ** 3,
        "A1": np.pi * lam * q2,
        "B2": (2 * np.pi / 3 * l2) * q2 ** 1.5,
        "A2": (2 * np.pi / 3 * l2) * q2 ** 1.5,
        "A3": 0.5 * np.pi * lam * l2 * q2 * q2,
    }
    ap = q2 <= k_ap ** 2
    labels, terms, scales = [], [], []

    def add(label, term):
        t_ap = term[ap]
        s = float(np.sqrt(np.mean((t_ap - t_ap.mean()) ** 2)))
        if s <= 0:
            raise ValueError(f"aberration term {label} has no variation "
                             "inside the aperture — unidentifiable")
        labels.append(label)
        terms.append(term / s)
        scales.append(s)

    for name in names:
        if name not in radial:
            raise ValueError(f"unknown aberration {name!r}; supported: "
                             f"{sorted(radial)}")
        if name in _ANISO_ORDER:
            m = _ANISO_ORDER[name]
            add(f"{name}a", radial[name] * np.cos(m * phi))
            add(f"{name}b", radial[name] * np.sin(m * phi))
        else:
            add(name, radial[name])
    return labels, np.stack(terms), np.asarray(scales)


@functools.partial(jax.jit, static_argnames=("eV", "dz", "lr_v", "lr_ab"))
def _aberr_run(amps, scan_pos, batches, v0, c0, probe0, basis, kx, ky, *,
               eV: float, dz: float, lr_v: float, lr_ab: float):
    import optax

    prec = _precision_of(v0.dtype)
    p0k = matfft.fft2(probe0)

    def batch_loss(params, a_b, idx):
        chi = jnp.tensordot(params["c"], basis, axes=1)
        pk = p0k * jax.lax.complex(jnp.cos(chi), -jnp.sin(chi))
        ramps = _shift_ramps(kx, ky, jnp.take(scan_pos, idx, axis=0))
        psi_b = matfft.ifft2(pk[None] * ramps)
        return _amplitude_misfit(psi_b, params["v"], a_b, kx, ky, eV=eV,
                                 dz=dz, prec=prec)

    opt = optax.multi_transform(
        {"v": optax.adam(lr_v), "c": optax.adam(lr_ab)},
        {"v": "v", "c": "c"})
    params = {"v": v0, "c": c0}
    state = opt.init(params)

    def one_step(carry, idx):
        params, state = carry
        a_b = jnp.take(amps, idx, axis=0)
        val, g = jax.value_and_grad(batch_loss)(params, a_b, idx)
        updates, state = opt.update(g, state)
        params = optax.apply_updates(params, updates)
        return (params, state), val.astype(v0.dtype)

    (params, _), losses = jax.lax.scan(one_step, (params, state), batches)
    return params["v"], params["c"], losses


def refine_aberrations(data4d, scan_positions, probe,
                       coefficients=("C1", "C3"), *, n_slices: int = 1,
                       dz: float = 1.0, steps: int = 400,
                       batch: Optional[int] = None, lr: float = 8.0,
                       lr_ab: float = 0.05, v_init=None,
                       seed: int = 0) -> dict:
    """Fit RESIDUAL probe aberrations (relative to ``probe``) jointly with
    the specimen potential, from intensity-only 4D-STEM data — gradient
    descent through probe synthesis + the multislice adjoint. This is
    instrument self-calibration: ptychographic aberration measurement
    (e.g. the BEACON approach) without a known specimen.

    Args:
        data4d / scan_positions / probe: as msp_reconstruct (fftshifted
            intensities; (npos, 2) Angstrom; the assumed illumination —
            fitted aberrations are the CORRECTION on top of it).
        coefficients: aberration names to fit, Krivanek notation matching
            physics.aberrations: isotropic "C1"/"C3"/"C5" and anisotropic
            "A1"/"B2"/"A2"/"A3" (each anisotropic fits a Cartesian (a, b)
            pair; magnitude/azimuth are reported).
        n_slices/dz/steps/batch/lr/v_init/seed: as msp_reconstruct.
        lr_ab: Adam rate for the (RMS-normalized) aberration coordinates —
            0.05 corresponds to roughly 5% of an aperture-filling phase
            wave per step regardless of the coefficient's physical scale.

    Returns dict with ``aberrations`` (a physics.aberrations.Aberrations
    of the fitted residuals), ``coefficients`` ({label: Angstrom} raw
    Cartesian values), ``potential``, ``losses``.
    """
    from ..core.constants import wavelength
    from ..physics.aberrations import Aberrations

    prec = probe.precision
    rd = np.dtype(prec.real)
    data = np.asarray(data4d)
    npos = data.shape[0]
    scan = np.asarray(scan_positions, np.float64)
    if scan.shape[0] != npos:
        raise ValueError(f"data4d has {npos} patterns but scan_positions "
                         f"has {scan.shape[0]}")
    p0 = probe.array
    if p0.ndim != 2:
        raise ValueError("probe must be a single (nx, ny) Probe")

    lam = wavelength(probe.eV)
    k_ap = (probe.mrad * 1e-3) / lam if probe.mrad else float(
        np.max(np.abs(np.asarray(probe.kxs))))
    labels, terms, scales = _aberration_basis(probe.kxs, probe.kys, lam,
                                              tuple(coefficients), k_ap)

    amps = _detector_amplitudes(data)
    nb = npos if batch is None else int(min(batch, npos))
    batches = _epoch_batches(npos, nb, steps, seed)
    if v_init is None:
        v0 = jnp.zeros((n_slices,) + tuple(p0.shape), dtype=rd)
    else:
        v0 = jnp.asarray(np.asarray(v_init), dtype=rd)

    v, c, losses = _aberr_run(
        jnp.asarray(amps.astype(rd)), jnp.asarray(scan.astype(rd)),
        jnp.asarray(batches), v0,
        jnp.zeros(len(labels), rd), p0,
        jnp.asarray(terms.astype(rd)),
        jnp.asarray(probe.kxs.astype(rd)),
        jnp.asarray(probe.kys.astype(rd)),
        eV=float(probe.eV), dz=float(dz), lr_v=float(lr),
        lr_ab=float(lr_ab))
    phys = np.asarray(c, np.float64) / scales
    coeffs = dict(zip(labels, phys.tolist()))

    ab_kw = {}
    for name in coefficients:
        if name in _ANISO_ORDER:
            m = _ANISO_ORDER[name]
            a_v, b_v = coeffs[f"{name}a"], coeffs[f"{name}b"]
            ab_kw[name] = float(np.hypot(a_v, b_v))
            ab_kw[f"phi_{name}"] = float(np.arctan2(b_v, a_v) / m)
        else:
            ab_kw[name] = float(coeffs[name])
    return dict(aberrations=Aberrations(**ab_kw), coefficients=coeffs,
                potential=np.asarray(v), losses=np.asarray(losses))


# --- tilt-series (tomographic) structure refinement ---------------------------


def rotation_about_x(theta_rad: float) -> np.ndarray:
    """Right-handed rotation about the x (tilt) axis."""
    c, s = np.cos(theta_rad), np.sin(theta_rad)
    return np.array([[1.0, 0.0, 0.0], [0.0, c, -s], [0.0, s, c]])


def refine_structure_tilt_series(datasets, scan_positions, probe,
                                 positions0, types, zs, tilt_angles_deg, *,
                                 steps: int = 300,
                                 batch: Optional[int] = None,
                                 lr: float = 5e-3, seed: int = 0,
                                 pad_fraction: float = 0.5,
                                 center=None) -> dict:
    """Atomic-coordinate refinement against a TILT SERIES of 4D-STEM
    datasets — tomographic: a single projection's slice binning makes z
    gradients exactly zero (refine_structure's documented limitation),
    but each tilt rotates a different combination of (y, z) into the
    imaged plane, so a few tilts constrain ALL THREE coordinates (the
    forward-model refinement step of atomic electron tomography).

    Per tilt t the model is ``rasterize(R_t @ r) -> multislice ->
    detector`` with the SAME atom coordinates r; Adam steps cycle
    round-robin over tilts, each step descending one tilt's minibatch
    misfit. Rotations are about the x axis (the usual tilt axis),
    positive angles right-handed, applied about ``center`` (default: the
    centroid of ``positions0``) so the structure stays inside the cell.

    Args:
        datasets: sequence of (npos_t, nkx, nky) intensity stacks, one
            per tilt (fftshifted detector layout).
        scan_positions: (npos_t, 2) per tilt (sequence, like datasets).
        probe/types/zs/steps/batch/lr/seed/pad_fraction: as
            refine_structure; each tilt gets its own static rasterization
            plan built from the rotated starting model (keep refinement
            displacements well under the slice thickness).
        tilt_angles_deg: the tilt series, degrees.

    Returns dict with ``positions`` ((n_atoms, 3) — all three coordinates
    refined), ``displacement`` ((n_atoms,) 3-D |r - r0|), ``losses``
    ((steps,) the stepped tilt's minibatch loss).
    """
    import optax

    prec = probe.precision
    rd = np.dtype(prec.real)
    n_tilts = len(tilt_angles_deg)
    if len(datasets) != n_tilts or len(scan_positions) != n_tilts:
        raise ValueError(
            f"need one dataset + scan set per tilt: {len(datasets)} "
            f"datasets / {len(scan_positions)} scans / {n_tilts} tilts")
    pos0 = np.asarray(positions0, np.float64)
    p0 = probe.array
    if p0.ndim != 2:
        raise ValueError("probe must be a single (nx, ny) Probe")
    ctr = (pos0.mean(axis=0) if center is None
           else np.asarray(center, np.float64))

    rots, plans, amps_t, scans_t, batches_t = [], [], [], [], []
    for t, ang in enumerate(tilt_angles_deg):
        r_mat = rotation_about_x(np.deg2rad(float(ang)))
        rots.append(jnp.asarray((r_mat.T).astype(rd)))   # row-vector form
        rot0 = (pos0 - ctr) @ r_mat.T + ctr
        plans.append(make_plan(probe.xs, probe.ys, zs, rot0[None],
                               np.asarray(types, np.int32),
                               pad_fraction=pad_fraction))
        data = np.asarray(datasets[t])
        scan = np.asarray(scan_positions[t], np.float64)
        if scan.shape[0] != data.shape[0]:
            raise ValueError(f"tilt {t}: {data.shape[0]} patterns but "
                             f"{scan.shape[0]} scan positions")
        amps_t.append(jnp.asarray(_detector_amplitudes(data).astype(rd)))
        scans_t.append(jnp.asarray(scan.astype(rd)))
        nb = data.shape[0] if batch is None else int(min(batch,
                                                         data.shape[0]))
        n_steps_t = (steps + n_tilts - 1 - t) // n_tilts
        batches_t.append(jnp.asarray(_epoch_batches(
            data.shape[0], nb, max(n_steps_t, 1), seed + t)))

    dz = float(zs[1] - zs[0]) if len(np.asarray(zs)) > 1 else 1.0
    eV = float(probe.eV)
    ctr_j = jnp.asarray(ctr.astype(rd))

    def make_loss(t):
        plan = plans[t]

        def loss(atom_pos, a_b, idx, probe0):
            # probe0 is an ARGUMENT, not a closure capture: jit would
            # constant-fold a captured device complex array through a
            # host transfer, which this runtime cannot do.
            rp = (atom_pos - ctr_j) @ rots[t] + ctr_j
            v = rasterize(rp, plan, prec)
            kx = jnp.asarray(probe.kxs.astype(rd))
            ky = jnp.asarray(probe.kys.astype(rd))
            ramps = _shift_ramps(kx, ky, jnp.take(scans_t[t], idx, axis=0))
            psi_b = matfft.ifft2(matfft.fft2(probe0)[None] * ramps)
            return _amplitude_misfit(psi_b, v, a_b, kx, ky, eV=eV, dz=dz,
                                     prec=prec)
        return loss

    opt = optax.adam(lr)
    pos = jnp.asarray(pos0.astype(rd))
    state = opt.init(pos)

    steppers = []
    for t in range(n_tilts):
        loss_t = make_loss(t)

        @functools.partial(jax.jit, static_argnames=())
        def step_t(pos, state, a_b, idx, probe0, _loss=loss_t):
            val, g = jax.value_and_grad(_loss)(pos, a_b, idx, probe0)
            updates, state = opt.update(g, state)
            return optax.apply_updates(pos, updates), state, val
        steppers.append(step_t)

    # keep the async dispatch pipeline full: collect DEVICE loss scalars
    # and pull them once at the end (a per-step float() would serialize a
    # relay round trip into every Adam step)
    losses = []
    counters = [0] * n_tilts
    for s in range(steps):
        t = s % n_tilts
        idx = batches_t[t][counters[t]]
        counters[t] += 1
        a_b = jnp.take(amps_t[t], idx, axis=0)
        pos, state, val = steppers[t](pos, state, a_b, idx, p0)
        losses.append(val)
    losses = np.asarray([float(v) for v in losses], rd)

    pos = np.asarray(pos, np.float64)
    disp = np.linalg.norm(pos - pos0, axis=1)
    return dict(positions=pos, displacement=disp, losses=losses)

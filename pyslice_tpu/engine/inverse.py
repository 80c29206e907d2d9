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
        exit_b = multislice_diff(psi_b, v, kx, ky, eV=eV, dz=dz,
                                 precision=prec)
        mag = jnp.abs(matfft.fft2(exit_b))
        return jnp.mean((mag - a_b) ** 2)

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

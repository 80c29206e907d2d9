#!/usr/bin/env python
"""Quantify the accuracy cost of ``setup(fast_grid=True)`` (verdict item 3).

``fast_grid`` snaps the in-plane point counts UP to multiples of 128
(core/grids.py::grid_from_box) so the propagation qualifies for the fused
Pallas path (~2.9x on reference-natural odd grids, BENCHMARKS.md "Round
4"). The box is unchanged, so the snapped grid samples the SAME physical
cell slightly finer: reciprocal-space pitch stays exactly 1/L on both
grids and the natural grid's k points are a strict subset of the snapped
grid's. The residuals printed here are therefore pure discretization
differences of matched physics (both runs x64, same trajectory, same
probes), not resampling artifacts.

Reference context: the reference's grid rule is int(l/sampling)+1
(/root/reference/src/multislice/potentials.py:123-129), which lands on
MXU-hostile odd counts like 1023; it has no fast-grid escape.

Observables compared (natural vs snapped):

* TACAW spectrum        — (n_freq,) probe-averaged, frequency bins are
                          grid-independent (time axis only).
* TACAW masked spectrum — annulus 1.0 < |k| < 2.0 1/Angstrom built from
                          each grid's PHYSICAL k axis (fftfreq(n, L/n)).
* HAADF image           — (n_probes,) at 45 mrad collection.
* diffraction           — compared point-for-point at the SHARED physical
                          k points (multiples of 1/L with |m| <= (n-1)/2).

Usage: python tools/fast_grid_error.py [--scale test|prod]
  test (default): 255^2 -> 256^2 class, runs in ~1 min on CPU x64.
  prod:           1023^2 -> 1024^2 class (the measured 2.9x-tax shape).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def physical_k(n: int, length: float) -> np.ndarray:
    """fftshifted physical k axis (cycles/Angstrom): fftfreq(n, L/n)."""
    return np.fft.fftshift(np.fft.fftfreq(n, d=length / n))


def relerr(a: np.ndarray, b: np.ndarray) -> float:
    """max|a-b| / max|b| — the repo's standard parity residual."""
    return float(np.max(np.abs(a - b)) / max(float(np.max(np.abs(b))),
                                             1e-300))


def l2err(a: np.ndarray, b: np.ndarray) -> float:
    """||a-b|| / ||b|| — the energy-weighted view of the same residual."""
    return float(np.linalg.norm(a - b) / max(float(np.linalg.norm(b)),
                                             1e-300))


def run_one(traj, fast_grid: bool, n_probes: int = 4, sampling: float = 0.1):
    from pyslice_tpu.analysis.haadf import HAADFData
    from pyslice_tpu.analysis.tacaw import TACAWData
    from pyslice_tpu.engine.calculator import MultisliceCalculator

    calc = MultisliceCalculator(precision="double")
    calc.setup(traj, aperture=20, voltage_eV=100e3, sampling=sampling,
               slice_thickness=0.5, use_cache=False, fast_grid=fast_grid,
               probe_positions=[(0.5 + 0.4 * i, 0.8) for i in
                                range(n_probes)])
    t0 = time.time()
    wf = calc.run(progress=False)
    dt = time.time() - t0
    tac = TACAWData(wf)

    lx = float(traj.box_matrix[0, 0])
    ly = float(traj.box_matrix[1, 1])
    kx = physical_k(calc.nx, lx)
    ky = physical_k(calc.ny, ly)
    k2 = np.add.outer(kx ** 2, ky ** 2)
    annulus = ((k2 > 1.0) & (k2 < 4.0)).astype(float)

    # Grid-size-invariant normalization: with unit-total probes, k-space
    # intensity totals scale with the pixel count (unnormalized FFT), so
    # every compared observable is reported per pixel-count. Without this
    # a 256^2-vs-255^2 comparison carries a spurious (256/255)^2 ~ 0.8%
    # scale and a 2x-sampling oracle a 4x one.
    n_pix = calc.nx * calc.ny
    return dict(
        nx=calc.nx, ny=calc.ny, wall_s=dt,
        spectrum=np.asarray(tac.spectrum()) / n_pix,
        masked=np.asarray(tac.masked_spectrum(annulus)) / n_pix,
        haadf=np.asarray(
            HAADFData(wf).calculateADF(collection_angle=45)) / n_pix,
        diffraction=np.asarray(tac.diffraction()) / n_pix,
        kx=kx, ky=ky)


def shared_diffraction(*runs):
    """Diffraction values at the k points ALL grids share: every grid spans
    the same box, so each k axis is multiples of 1/L; modes |m| up to the
    smallest grid's limit exist on every grid (zero mode sits at index n//2
    after fftshift for either parity)."""
    mmax = min((r["nx"] - 1) // 2 for r in runs)
    nmax = min((r["ny"] - 1) // 2 for r in runs)
    out = []
    for r in runs:
        sx = np.arange(-mmax, mmax + 1) + r["nx"] // 2
        sy = np.arange(-nmax, nmax + 1) + r["ny"] // 2
        out.append(r["diffraction"][np.ix_(sx, sy)])
    return out


def main():
    scale = "prod" if "--scale=prod" in sys.argv or "prod" in sys.argv[1:] \
        else "test"
    import jax
    if "--tpu" not in sys.argv:
        # Accuracy run: CPU x64 (forced via config — the axon TPU platform
        # ignores the JAX_PLATFORMS env var). --tpu keeps the ambient
        # device for speedup measurements (f32/c64 there).
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    print(f"# backend={jax.default_backend()} "
          f"x64={jax.config.jax_enable_x64}", file=sys.stderr)
    from tools.bench_configs import hbn_box

    # lx chosen so int(lx/0.1)+1 lands 1 below a multiple of 128: the
    # mildest (and production-typical, BENCHMARKS.md "Round 4") snap.
    lx = 102.25 if scale == "prod" else 25.45
    traj = hbn_box(lx, 8)
    nat = run_one(traj, fast_grid=False)
    snap = run_one(traj, fast_grid=True)
    assert snap["nx"] % 128 == 0 and snap["nx"] != nat["nx"], \
        (nat["nx"], snap["nx"])

    d_nat, d_snap = shared_diffraction(nat, snap)
    res = dict(
        scale=scale,
        natural_grid=f"{nat['nx']}x{nat['ny']}",
        snapped_grid=f"{snap['nx']}x{snap['ny']}",
        spectrum_relerr=relerr(snap["spectrum"], nat["spectrum"]),
        spectrum_l2err=l2err(snap["spectrum"], nat["spectrum"]),
        masked_spectrum_relerr=relerr(snap["masked"], nat["masked"]),
        haadf_relerr=relerr(snap["haadf"], nat["haadf"]),
        haadf_l2err=l2err(snap["haadf"], nat["haadf"]),
        diffraction_shared_k_relerr=relerr(d_snap, d_nat),
        diffraction_shared_k_l2err=l2err(d_snap, d_nat),
        natural_wall_s=round(nat["wall_s"], 2),
        snapped_wall_s=round(snap["wall_s"], 2))

    if "--control" in sys.argv:
        # Convergence control: distance of EACH grid to a 2x-finer natural
        # oracle on the same box. If both sit at comparable distance, the
        # natural<->snapped delta is discretization uncertainty at the
        # requested sampling — neither grid is privileged — and fast_grid
        # does not degrade accuracy, it moves within the envelope. Only the
        # strictly domain-limited observables are compared against the
        # oracle (the annulus-masked spectrum and the shared-k diffraction)
        # — full-k sums like spectrum()/calculateADF integrate to each
        # grid's own Nyquist edge, which a 2x-finer grid extends.
        truth = run_one(traj, fast_grid=False, sampling=0.05)
        dt_nat, dt_snap, dt_truth = shared_diffraction(nat, snap, truth)
        res["masked_nat_vs_truth"] = l2err(nat["masked"], truth["masked"])
        res["masked_snap_vs_truth"] = l2err(snap["masked"], truth["masked"])
        res["diffraction_nat_vs_truth"] = l2err(dt_nat, dt_truth)
        res["diffraction_snap_vs_truth"] = l2err(dt_snap, dt_truth)
    print(json.dumps(res))


if __name__ == "__main__":
    main()

"""Quantified accuracy bounds for ``setup(fast_grid=True)`` (round-5
verdict item 3).

``fast_grid`` snaps in-plane point counts UP to multiples of 128 for the
fused Pallas path (~2.9x on reference-natural odd grids). The box is
unchanged: the snapped grid samples the SAME cell slightly finer, k pitch
stays exactly 1/L, and the natural grid's k points are a subset of the
snapped grid's. These tests pin the measured observable-level deltas
(tools/fast_grid_error.py; full table in PARITY.md "fast_grid") and the
convergence-control fact that makes them interpretable: BOTH grids sit
far (~67%) from a 2x-finer oracle while sitting ~1-2% from each other,
at distances within 10% of one another (snap marginally closer at the
255-class, marginally farther at the 1023-class) — fast_grid moves
within the discretization envelope of the requested sampling rather
than degrading accuracy; neither grid is privileged.

Reference context: the reference's grid rule int(l/sampling)+1
(/root/reference/src/multislice/potentials.py:123-129) has no fast-grid
escape; fast_grid=False reproduces it exactly.
"""

import numpy as np
import pytest

from tools.bench_configs import hbn_box
from tools.fast_grid_error import l2err, relerr, run_one, shared_diffraction


@pytest.fixture(scope="module")
def runs():
    # 255 -> 256 class: the mildest (production-typical) snap, x64.
    traj = hbn_box(25.45, 8)
    nat = run_one(traj, fast_grid=False)
    snap = run_one(traj, fast_grid=True)
    assert (nat["nx"], snap["nx"]) == (255, 256)
    return traj, nat, snap


@pytest.mark.slow
class TestFastGridBounds:
    def test_integrated_observables_within_documented_bound(self, runs):
        """TACAW spectrum / masked spectrum / HAADF: <= 5% (measured
        1.1-2.5% at this scale, 6-10% at the 1023-class prod scale —
        PARITY.md). Pointwise diffraction at shared k: <= 20% (measured
        ~12%)."""
        _, nat, snap = runs
        assert relerr(snap["spectrum"], nat["spectrum"]) < 0.05
        assert relerr(snap["masked"], nat["masked"]) < 0.05
        assert relerr(snap["haadf"], nat["haadf"]) < 0.05
        d_nat, d_snap = shared_diffraction(nat, snap)
        assert relerr(d_snap, d_nat) < 0.20

    def test_snap_within_convergence_envelope(self, runs):
        """The decisive control: against a 2x-finer natural-grid oracle,
        the two grids sit at COMPARABLE distance (within 10% of each
        other; measured: snap marginally closer at this 255-class scale,
        marginally farther at the 1023-class prod scale — i.e. neither
        grid is privileged) while their mutual delta is an order of
        magnitude smaller than either distance. Both distances are large
        (~67%): the thermal-fluctuation observables are far from
        converged at sampling=0.1 on EITHER grid — that envelope, not
        the snap, dominates the error budget."""
        traj, nat, snap = runs
        truth = run_one(traj, fast_grid=False, sampling=0.05)
        m_nat = l2err(nat["masked"], truth["masked"])
        m_snap = l2err(snap["masked"], truth["masked"])
        assert abs(m_snap - m_nat) < 0.1 * m_nat, (m_nat, m_snap)
        d_nat, d_snap, d_truth = shared_diffraction(nat, snap, truth)
        dd_nat = l2err(d_nat, d_truth)
        dd_snap = l2err(d_snap, d_truth)
        assert abs(dd_snap - dd_nat) < 0.1 * dd_nat, (dd_nat, dd_snap)
        # and the nat<->snap delta is tiny against that envelope
        assert l2err(snap["masked"], nat["masked"]) < 0.1 * m_nat

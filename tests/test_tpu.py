"""On-hardware regression tier (VERDICT item 10).

Run with:  PYSLICE_TPU_TESTS=1 python -m pytest tests/ -m tpu -q

Two sub-tiers (round-5 split — the full tier had grown to ~27 min cold):
* ``-m "tpu and not slow"`` — every kernel-parity check at its aligned
  shape + the e2e-vs-f64-oracle tests; ~17 min cold through the relay,
  well under 8 min warm (persistent compile cache).
* ``-m tpu`` — adds the adjoint heavyweights, the odd-shape (387/1023)
  kernel variants, and the production-scale e2e run.

These catch Mosaic/runtime regressions the CPU interpreter cannot: the
fused kernels' actual compiled numerics, the fully-fused k-conversion, the
odd-grid kernel, and the persistent compile cache. Everything here uses
single precision (x64 is unavailable on TPU) and compares against the XLA
path on the same device at the reference's squared-magnitude-residual bar
(dz <= 1e-6, 00_probe.py:26-28). Budget: a few minutes cold, <1 min warm
(persistent compile cache).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu


def _require_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")


def _residual(a, b):
    f = np.abs(a)
    d = np.abs(b)
    return float(((f - d) ** 2).sum() / (f ** 2).sum())


def _frame_pair(nx, ny, n_probes=4, nz=5, seed=0, bandwidth_limit=None,
                tilt=None):
    """(fused 'auto' output, XLA 'off' output) for one synthetic frame."""
    from pyslice_tpu.core.grids import Grid
    from pyslice_tpu.engine.pipeline import SimSpec, frame_exit_waves
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.physics.potential import make_plan
    from pyslice_tpu.physics.probe import Probe, create_batched_probes
    from pyslice_tpu.utils.host import to_numpy

    lx, ly, lz = nx * 0.1, ny * 0.1, nz * 1.0
    xs = np.linspace(0, lx, nx, endpoint=False)
    ys = np.linspace(0, ly, ny, endpoint=False)
    zs = np.linspace(0, lz, nz, endpoint=False)
    grid = Grid(xs=xs, ys=ys, zs=zs, lx=lx, ly=ly, lz=lz,
                sampling=0.1, slice_thickness=1.0)
    rng = np.random.default_rng(seed)
    pos = rng.random((1, 60, 3)) * np.array([lx, ly, lz - 0.1])
    types = rng.integers(1, 15, 60).astype(np.int32)
    plan = make_plan(grid.xs, grid.ys, grid.zs, pos, types)
    probe = Probe(grid.xs, grid.ys, 20, 100e3)
    probes = create_batched_probes(
        probe, [(lx * (0.2 + 0.5 * i / n_probes), ly * 0.4)
                for i in range(n_probes)]).array
    outs = {}
    old = ops_config.fused_multislice
    try:
        for mode in ("auto", "off"):
            ops_config.fused_multislice = mode
            spec = SimSpec.create(grid, plan, 100e3,   # fresh per mode
                                  bandwidth_limit=bandwidth_limit,
                                  tilt=tilt)
            outs[mode] = to_numpy(frame_exit_waves(
                jnp.asarray(pos[0], jnp.float32), probes, spec))
    finally:
        ops_config.fused_multislice = old
    return outs["auto"], outs["off"]


def test_fused_1024_parity_on_hardware():
    """Aligned Pallas kernel + fused k-conversion vs the XLA path at
    1024^2 (the headline shape), on the real MXU."""
    _require_tpu()
    fused, xla = _frame_pair(1024, 1024, n_probes=2, nz=4)
    assert np.all(np.isfinite(fused))
    assert _residual(xla, fused) < 1e-6


def test_fused_odd_parity_on_hardware():
    """Digit-split odd kernel vs the XLA path at a reference-natural odd
    size (387 = 3 * 129)."""
    _require_tpu()
    from pyslice_tpu.ops import fused_step_odd
    assert fused_step_odd.supported_size_odd(387)
    fused, xla = _frame_pair(387, 387, n_probes=2, nz=4)
    assert np.all(np.isfinite(fused))
    assert _residual(xla, fused) < 1e-6


@pytest.mark.parametrize(
    "nx", [256, pytest.param(387, marks=pytest.mark.slow)],
    ids=["aligned256", "odd387"])   # aligned kernel / odd kernel
def test_bandwidth_limit_fused_parity_on_hardware(nx):
    """The antialiasing band limit folded into the Pallas kernels'
    Fresnel planes vs the XLA path's masked propagator, on hardware, and
    it must actually differ from the unlimited run."""
    _require_tpu()
    fused, xla = _frame_pair(nx, nx, n_probes=2, nz=4,
                             bandwidth_limit=2.0 / 3.0)
    assert np.all(np.isfinite(fused))
    assert _residual(xla, fused) < 1e-6
    full, _ = _frame_pair(nx, nx, n_probes=2, nz=4)
    assert _residual(full, fused) > 1e-8


@pytest.mark.parametrize(
    "nx", [256, pytest.param(387, marks=pytest.mark.slow)],
    ids=["aligned256", "odd387"])   # aligned kernel / odd kernel
def test_beam_tilt_fused_parity_on_hardware(nx):
    """The tilted-propagator phase folded into the Pallas kernels'
    Fresnel planes vs the XLA path, on hardware."""
    _require_tpu()
    fused, xla = _frame_pair(nx, nx, n_probes=2, nz=4, tilt=(9.0, -4.0))
    assert np.all(np.isfinite(fused))
    assert _residual(xla, fused) < 1e-6
    straight, _ = _frame_pair(nx, nx, n_probes=2, nz=4)
    assert _residual(straight, fused) > 1e-8


@pytest.mark.parametrize(
    "nx", [256, pytest.param(387, marks=pytest.mark.slow)],
    ids=["aligned256", "odd387"])   # aligned kernel / odd kernel
def test_oblique_fused_parity_on_hardware(nx):
    """The oblique-metric Fresnel multiplier inside the Pallas kernels vs
    the XLA path, on hardware, at a fused-eligible size."""
    _require_tpu()
    from pyslice_tpu.physics.propagate import multislice
    rng = np.random.default_rng(3)
    ny = nx
    psi = (rng.standard_normal((2, nx, ny))
           + 1j * rng.standard_normal((2, nx, ny))).astype(np.complex64)
    pot = (rng.standard_normal((4, nx, ny)) * 20).astype(np.float32)
    # an oblique metric: ksq with a cross term
    m = np.rint(np.fft.fftfreq(nx) * nx)
    n = np.rint(np.fft.fftfreq(ny) * ny)
    g11, g22, g12 = 1.2e-5, 0.9e-5, 0.3e-5
    ksq = (g11 * m[:, None] ** 2 + g22 * n[None, :] ** 2
           + 2 * g12 * m[:, None] * n[None, :]).astype(np.float32)
    kxs = np.fft.fftfreq(nx, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(ny, 0.1).astype(np.float32)

    from pyslice_tpu.utils.host import to_device_complex, to_numpy
    psi_d = to_device_complex(psi)
    outs = {}
    for fused in (True, False):
        outs[fused] = to_numpy(multislice(
            psi_d, jnp.asarray(pot), kxs, kys, eV=100e3, dz=0.5,
            precision="single", fused=fused, ksq=jnp.asarray(ksq)))
    assert _residual(outs[False], outs[True]) < 1e-6


def test_fused_kspace_checksum():
    """fused_multislice_kspace (k-conversion folded into the kernel chain)
    against the unfused conversion of the fused exit wave."""
    _require_tpu()
    from pyslice_tpu.core.constants import interaction_parameter, wavelength
    from pyslice_tpu.ops import matfft
    from pyslice_tpu.ops.fused_step import (fused_multislice,
                                            fused_multislice_kspace)
    rng = np.random.default_rng(1)
    nx = ny = 256
    nz = 4
    re = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))
    im = jnp.asarray(rng.standard_normal((2, nx, ny)).astype(np.float32))
    v = jnp.asarray((rng.standard_normal((nz, nx, ny)) * 30)
                    .astype(np.float32))
    kxs = np.fft.fftfreq(nx, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(ny, 0.1).astype(np.float32)
    eV = 100e3
    kw = dict(sigma=interaction_parameter(eV), lam=wavelength(eV), dz=0.5)

    @jax.jit
    def run(r, i, v):
        psi = jax.lax.complex(r, i)
        k1 = fused_multislice_kspace(psi, v, kxs, kys, **kw)
        exit_wave = fused_multislice(psi, v, kxs, kys, **kw)
        k2 = jnp.fft.fftshift(matfft.fft2(exit_wave), axes=(-2, -1))
        return jnp.sum(jnp.abs(k1)), jnp.sum(jnp.abs(k1 - k2))

    total, diff = run(re, im, v)
    assert float(diff) / float(total) < 1e-5


def test_resident_vs_chain_on_hardware():
    """The VMEM-resident kernel vs the two-pass chain, compiled, on the
    same device: same frame, k-space outputs within the regression bar.
    (With few probes the dispatcher picks resident by default; forcing
    resident_multislice='off' pins the chain for the comparison.)"""
    _require_tpu()
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.ops.fused_step_resident import resident_preferred
    assert resident_preferred(2, 512, 512)
    outs = {}
    old = ops_config.resident_multislice
    try:
        for mode in ("auto", "off"):
            ops_config.resident_multislice = mode
            fused, xla = _frame_pair(512, 512, n_probes=2, nz=4,
                                     seed=11)
            outs[mode] = fused
            assert _residual(xla, fused) < 1e-6
    finally:
        ops_config.resident_multislice = old
    assert _residual(outs["off"], outs["auto"]) < 1e-6


def test_persistent_compile_cache_active():
    """The persistent XLA compile cache (enabled at import) must be
    writing entries — it is what turns minutes of recompiles into seconds."""
    _require_tpu()
    from pathlib import Path
    import pyslice_tpu  # noqa: F401  (import enables the cache)
    cache_dir = jax.config.jax_compilation_cache_dir
    assert cache_dir, "compilation cache not configured"
    # force at least one compilation with a fresh shape
    x = jnp.zeros((17, 33), jnp.float32)
    jax.jit(lambda a: (a * 3).sum())(x).block_until_ready()
    p = Path(cache_dir)
    assert p.exists() and any(p.iterdir()), f"no cache entries in {p}"


@pytest.mark.slow
def test_odd_resident_vs_chain_on_hardware():
    """The single-dispatch odd-resident kernel (round-3 item 1) vs the
    two-pass odd chain, both against the XLA path at 387^2 on the real
    MXU — the chain is forced by resident_multislice='off' (auto now
    dispatches the resident form everywhere it fits)."""
    _require_tpu()
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.ops.fused_step_odd_resident import (
        resident_odd_supported)
    assert resident_odd_supported(387, 387, 4, 2)
    old = ops_config.resident_multislice
    try:
        ops_config.resident_multislice = "off"
        chain, xla_c = _frame_pair(387, 387, n_probes=2, nz=4, seed=2)
    finally:
        ops_config.resident_multislice = old
    assert _residual(xla_c, chain) < 1e-6
    resident, xla_r = _frame_pair(387, 387, n_probes=2, nz=4, seed=2)
    assert _residual(xla_r, resident) < 1e-6
    assert _residual(chain, resident) < 1e-6


@pytest.mark.slow
def test_adjoint_fused_forward_on_hardware():
    """The O(1)-memory adjoint (physics/adjoint.py) with the FUSED Pallas
    forward on the real MXU: its gradient must match the same adjoint run
    over the XLA forward (the backward pass is identical — this isolates
    the fused exit wave feeding the reverse reconstruction), and descend a
    detector-weighted loss."""
    _require_tpu()
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.physics.adjoint import multislice_diff
    from pyslice_tpu.utils.host import to_device_complex, to_numpy

    nx = ny = 256
    nz = 6
    rng = np.random.default_rng(3)
    psi = (rng.normal(size=(2, nx, ny))
           + 1j * rng.normal(size=(2, nx, ny))).astype(np.complex64)
    v = (rng.normal(size=(nz, nx, ny)) * 30).astype(np.float32)
    kxs = np.fft.fftfreq(nx, d=0.1).astype(np.float32)
    kys = np.fft.fftfreq(ny, d=0.1).astype(np.float32)
    w = rng.random((nx, ny)).astype(np.float32)

    psi_d = to_device_complex(psi)

    def make_loss(fused):
        # psi is an explicit argument (NOT a closure capture: jit would
        # bake it as a constant, which needs a complex host transfer the
        # axon runtime cannot do).
        def loss(pot, p):
            out = multislice_diff(p, pot, kxs, kys, eV=100e3, dz=0.8,
                                  fused=fused)
            return jnp.mean(jnp.asarray(w)
                            * jnp.abs(jnp.fft.fft2(out)) ** 2)
        return loss

    g_fused = to_numpy(
        jax.jit(jax.grad(make_loss(None)))(jnp.asarray(v), psi_d))
    old = ops_config.fused_multislice
    try:
        ops_config.fused_multislice = "off"
        g_xla = to_numpy(
            jax.jit(jax.grad(make_loss(False)))(jnp.asarray(v), psi_d))
    finally:
        ops_config.fused_multislice = old
    assert _residual(g_xla, g_fused) < 1e-6
    # and the gradient is live (nonzero) — the loss is detector-weighted
    assert float(np.max(np.abs(g_xla))) > 0


@pytest.mark.slow
def test_adjoint_odd_backward_on_hardware():
    """The digit-split fused backward (composite odd grid, 387^2): adjoint
    gradient vs the XLA-scan backward on the same device."""
    _require_tpu()
    from pyslice_tpu.ops import config as ops_config
    from pyslice_tpu.physics.adjoint import multislice_diff
    from pyslice_tpu.utils.host import to_device_complex, to_numpy

    nx = ny = 387
    nz = 5
    rng = np.random.default_rng(7)
    psi = (rng.normal(size=(2, nx, ny))
           + 1j * rng.normal(size=(2, nx, ny))).astype(np.complex64)
    v = (rng.normal(size=(nz, nx, ny)) * 30).astype(np.float32)
    kxs = np.fft.fftfreq(nx, d=0.1).astype(np.float32)
    kys = np.fft.fftfreq(ny, d=0.1).astype(np.float32)
    w = rng.random((nx, ny)).astype(np.float32)

    psi_d = to_device_complex(psi)

    def make_loss(fused):
        def loss(pot, p):
            out = multislice_diff(p, pot, kxs, kys, eV=100e3, dz=0.8,
                                  fused=fused)
            return jnp.mean(jnp.asarray(w)
                            * jnp.abs(jnp.fft.fft2(out)) ** 2)
        return loss

    g_fused = to_numpy(
        jax.jit(jax.grad(make_loss(None)))(jnp.asarray(v), psi_d))
    old = ops_config.fused_multislice
    try:
        ops_config.fused_multislice = "off"
        g_xla = to_numpy(
            jax.jit(jax.grad(make_loss(False)))(jnp.asarray(v), psi_d))
    finally:
        ops_config.fused_multislice = old
    assert _residual(g_xla, g_fused) < 1e-6
    assert float(np.max(np.abs(g_xla))) > 0


def test_beam_tilt_direct_exitwave_parity_on_hardware():
    """REGRESSION: fused_multislice (the direct exit-wave entry, as
    opposed to the pipeline's fused k-space variant) dropped tantilt when
    building its Fresnel planes — the aligned fused forward silently ran
    UNTILTED. Compare the plain multislice() exit wave with tilt, fused
    vs XLA, and require it to differ from the untilted run."""
    _require_tpu()
    from pyslice_tpu.physics.propagate import multislice
    from pyslice_tpu.utils.host import to_device_complex, to_numpy

    nx = ny = 256
    rng = np.random.default_rng(4)
    psi = (rng.standard_normal((2, nx, ny))
           + 1j * rng.standard_normal((2, nx, ny))).astype(np.complex64)
    pot = (rng.standard_normal((4, nx, ny)) * 20).astype(np.float32)
    kxs = np.fft.fftfreq(nx, 0.1).astype(np.float32)
    kys = np.fft.fftfreq(ny, 0.1).astype(np.float32)
    psi_d = to_device_complex(psi)
    outs = {}
    for fused in (True, False):
        outs[fused] = to_numpy(multislice(
            psi_d, jnp.asarray(pot), kxs, kys, eV=100e3, dz=0.5,
            precision="single", fused=fused, tilt=(7.0, -3.0)))
    assert _residual(outs[False], outs[True]) < 1e-6
    straight = to_numpy(multislice(
        psi_d, jnp.asarray(pot), kxs, kys, eV=100e3, dz=0.5,
        precision="single", fused=True))
    assert _residual(straight, outs[True]) > 1e-8


def test_e2e_tacaw_spectrum_parity_vs_f64_oracle_on_hardware():
    """Round-4 verdict item 5: the FULL production path — calculator ->
    TACAWData -> spectrum — runs ON THE CHIP (c64 + bf16x3 fused kernels)
    and is compared against the in-tree float64 NumPy oracle computed on
    the host. The reference's own regression bar is the scale-invariant
    magnitude residual dz <= 1e-6 (00_probe.py:26-28); the measured
    on-chip numbers are recorded in PARITY.md."""
    _require_tpu()
    from pyslice_tpu.analysis.tacaw import TACAWData
    from pyslice_tpu.engine.calculator import MultisliceCalculator
    from pyslice_tpu.utils.host import to_numpy
    from tests import oracle
    from tests.fixtures import hbn_thermal

    traj = hbn_thermal(n_frames=4, sigma=0.05, nx=4, ny=2, seed=21)
    kwargs = dict(aperture=0, voltage_eV=100e3, sampling=0.04,
                  slice_thickness=0.5, use_cache=False)

    calc = MultisliceCalculator()
    calc.setup(traj, device_output=True, **kwargs)
    wf = calc.run(progress=False)
    assert wf.wavefunction_data.shape[2] > 200    # ~256^2-scale grid

    ref = oracle.oracle_pipeline(traj, **{k: v for k, v in kwargs.items()
                                          if k != "use_cache"})

    # Exit-wave magnitude residual, every (probe, frame, kx, ky) pixel.
    dz_wave = oracle.residual(to_numpy(wf.wavefunction_data), ref)
    assert dz_wave < 1e-6, f"on-chip exit-wave residual {dz_wave:.3e}"

    # TACAW spectrum: on-chip mean-subtracted time FFT + k sum vs oracle.
    spec = TACAWData(wf).spectrum()
    ref_spec = oracle.oracle_time_fft(ref[..., 0]).sum(axis=(2, 3)).mean(0)
    dz_spec = float(np.sum((spec - ref_spec) ** 2) / np.sum(ref_spec ** 2))
    assert dz_spec < 1e-6, f"on-chip TACAW spectrum residual {dz_spec:.3e}"
    print(f"\non-chip e2e residuals: exit waves {dz_wave:.3e}, "
          f"TACAW spectrum {dz_spec:.3e}")


def test_e2e_haadf_parity_vs_f64_oracle_on_hardware():
    """Companion to the TACAW e2e test: a 3x3 convergent-beam HAADF image
    computed entirely on the chip vs the f64 oracle's assembly of the same
    annular amplitude sum."""
    _require_tpu()
    from pyslice_tpu.analysis.haadf import HAADFData
    from pyslice_tpu.engine.calculator import MultisliceCalculator
    from pyslice_tpu.physics.probe import probe_grid
    from tests import oracle
    from tests.fixtures import hbn_thermal

    traj = hbn_thermal(n_frames=2, sigma=0.05, nx=4, ny=2, seed=22)
    box = np.asarray(traj.box_matrix)
    pg = probe_grid([1.0, box[0, 0] - 1.0], [1.0, box[1, 1] - 1.0], 3, 3)
    kwargs = dict(aperture=20, voltage_eV=100e3, sampling=0.04,
                  slice_thickness=0.5, probe_positions=pg.tolist())

    calc = MultisliceCalculator()
    calc.setup(traj, device_output=True, use_cache=False, **kwargs)
    wf = calc.run(progress=False)
    haadf = HAADFData(wf)
    adf = haadf.calculateADF(collection_angle=45)

    # Oracle image: identical scan-grid assembly (shared host code) over
    # the f64 oracle exit waves — isolates the on-chip numerics.
    from pyslice_tpu.analysis.wf_data import WFData
    ref = oracle.oracle_pipeline(traj, **kwargs)
    ref_wf = WFData(probe_positions=pg, time=np.asarray(wf.time),
                    kxs=np.asarray(wf.kxs), kys=np.asarray(wf.kys),
                    layer=np.asarray(wf.layer), wavefunction_data=ref,
                    probe=wf.probe)
    ref_adf = HAADFData(ref_wf).calculateADF(collection_angle=45)

    dz = float(np.sum((adf - ref_adf) ** 2) / np.sum(ref_adf ** 2))
    assert dz < 1e-6, f"on-chip HAADF residual {dz:.3e}"
    print(f"\non-chip HAADF residual vs f64 oracle: {dz:.3e}")


def _fetch_probes(arr, tries=5):
    """Per-probe chunked device->host fetch with bounded retry. Chunking
    keeps each relay request small; the retry rides out transient relay
    failures (the data is immutable on device, so a re-fetch is
    idempotent). Transfers go through utils.host.to_numpy — complex
    buffers cannot cross the axon host<->device boundary directly
    (utils/host.py)."""
    import time as _time
    from pyslice_tpu.utils.host import to_numpy
    outs = []
    for p in range(arr.shape[0]):
        for t in range(tries):
            try:
                outs.append(to_numpy(arr[p]))
                break
            except Exception:
                if t == tries - 1:
                    raise
                _time.sleep(30.0 * (t + 1))
    return np.stack(outs)


@pytest.mark.slow
def test_e2e_production_scale_parity_on_hardware():
    """Round-5 verdict item 4: the on-chip c64/bf16x3 error-accumulation
    question AT PRODUCTION SCALE — 1024^2 grid, 16 probes, 32 frames,
    14 slices (the headline BASELINE.md config 2/3 class), entirely on
    the chip, against float64 on the host.

    Split into two on-chip runs so the resident WFData stays ~1 GiB: the
    jointly-resident (16, 32, 1024, 1024) c64 array is 4 GiB and its
    TACAW time-FFT intermediates push the peak to ~10.7 GiB — inside
    v5e HBM but with no headroom (runs beyond that are what
    StreamingTACAW exists for). Frames are independent in the sim, so
    the split loses no numerical coverage:

    1. sim at production scale: the full 16-probe x 14-slice x 1024^2
       per-frame path on 2 of the 32 thermal frames (268 MB resident)
       vs the full f64 NumPy oracle (potential -> multislice ->
       k-space) — the within-frame c64/bf16x3 accumulation. The naive
       f64 oracle costs ~2 min/frame on the host, hence the subset
       (blessed by the round-5 verdict).
    2. full-length time-FFT accumulation: all 32 frames x 4 probes x
       1024^2 device-resident (1.07 GB), TACAW intensity computed on
       chip; the 32-frame mean-subtracted time FFT is recomputed in f64
       on the host from the ON-CHIP exit waves on two 96^2 k-space
       patches (bright central beam + dark off-axis) and compared, plus
       the public masked_spectrum reduction on the patch mask vs its
       f64 value.

    Measured numbers are recorded in PARITY.md next to the toy-scale
    (251x217 x 4-frame) residuals.
    """
    _require_tpu()
    from pyslice_tpu.analysis.tacaw import TACAWData
    from pyslice_tpu.engine.calculator import MultisliceCalculator
    from pyslice_tpu.physics.probe import probe_grid
    from tests import oracle
    from tests.fixtures import hbn_filled_box

    n_frames = 32
    traj = hbn_filled_box(102.35, n_frames, seed=5)
    pg16 = probe_grid([10.0, 90.0], [10.0, 90.0], 4, 4)

    # (1) production-shape sim parity: 16 probes, frames {0, 17}.
    subset = [0, 17]
    traj2 = traj.slice_timesteps(subset)
    kwargs = dict(aperture=30, voltage_eV=100e3, sampling=0.1,
                  slice_thickness=0.5, probe_positions=pg16.tolist())
    calc = MultisliceCalculator()
    calc.setup(traj2, device_output=True, use_cache=False, **kwargs)
    assert (calc.nx, calc.ny) == (1024, 1024), "headline shape"
    assert calc.nz >= 14
    nz = calc.nz
    wf2 = calc.run(progress=False)
    ref = oracle.oracle_pipeline(traj2, **kwargs)
    dz_frames = []
    for i in range(len(subset)):
        on_chip = _fetch_probes(wf2.wavefunction_data[:, i])
        dz_frames.append(oracle.residual(on_chip[..., -1], ref[:, i, :, :, -1]))
    dz_wave = max(dz_frames)
    assert dz_wave < 1e-6, f"production-scale exit-wave residual {dz_wave:.3e}"
    del wf2, calc, ref

    # (2) 32-frame time-FFT accumulation, f64 host vs on-chip TACAW.
    pg4 = probe_grid([20.0, 80.0], [20.0, 80.0], 2, 2)
    calc = MultisliceCalculator()
    calc.setup(traj, device_output=True, use_cache=False,
               aperture=30, voltage_eV=100e3, sampling=0.1,
               slice_thickness=0.5, probe_positions=pg4.tolist())
    wf = calc.run(progress=False)
    tac = TACAWData(wf)
    c = 1024 // 2
    patches = {"central": (c - 48, c - 48), "off-axis": (c + 150, c + 150)}
    dz_int = {}
    patch_waves = {}
    for name, (x0, y0) in patches.items():
        waves = _fetch_probes(
            wf.wavefunction_data[:, :, x0:x0 + 96, y0:y0 + 96, -1])
        patch_waves[name] = waves
        ref_int = oracle.oracle_time_fft(waves)          # f64, host
        chip_int = _fetch_probes(tac.intensity[:, :, x0:x0 + 96, y0:y0 + 96])
        dz_int[name] = float(np.sum((chip_int - ref_int) ** 2)
                             / np.sum(ref_int ** 2))
        assert dz_int[name] < 1e-6, (
            f"time-FFT accumulation residual ({name}) {dz_int[name]:.3e}")

    # Public masked_spectrum on the central patch mask vs its f64 value.
    x0, y0 = patches["central"]
    mask = np.zeros((1024, 1024), np.float32)
    mask[x0:x0 + 96, y0:y0 + 96] = 1.0
    spec = tac.masked_spectrum(mask)
    ref_spec = oracle.oracle_time_fft(
        patch_waves["central"]).sum(axis=(2, 3)).mean(axis=0)
    dz_spec = float(np.sum((spec - ref_spec) ** 2) / np.sum(ref_spec ** 2))
    assert dz_spec < 1e-6, f"masked_spectrum residual {dz_spec:.3e}"

    print(f"\nproduction-scale (1024^2 x 16p x {nz} slices; 32-frame "
          f"time FFT) on-chip residuals: exit waves {dz_wave:.3e} "
          f"(frames {subset}), time-FFT central {dz_int['central']:.3e} / "
          f"off-axis {dz_int['off-axis']:.3e}, masked_spectrum {dz_spec:.3e}")


@pytest.mark.slow
def test_odd_multiprobe_cost_model_split_parity_on_hardware():
    """Round-4 item 1: the multi-probe odd chain picks its digit split by
    the measured cost model (1023 x >=2 probes -> d=11/m=93; 5,227 vs
    4,494 slice-steps/s at 16 probes). Parity: the d=11 kernel's exit
    waves must match the d=3 kernel's (same frame, probe 0 of a 2-probe
    batch vs a 1-probe run) at the reference bar."""
    _require_tpu()
    from pyslice_tpu.ops import matfft
    from pyslice_tpu.ops.fused_step_odd import (fused_multislice_odd,
                                                supported_size_odd)
    from pyslice_tpu.utils.host import to_device_complex, to_numpy

    n = 1023
    assert matfft.scrambled_factors(n) == (3, 341)        # 1-probe default
    assert matfft.scrambled_factors(n, 2) == (11, 93)     # model switch
    assert supported_size_odd(n, 2)

    rng = np.random.default_rng(7)
    psi = (rng.standard_normal((2, n, n))
           + 1j * rng.standard_normal((2, n, n))).astype(np.complex64)
    pot = (rng.standard_normal((3, n, n)) * 5).astype(np.float32)
    kxs = np.fft.fftfreq(n, 0.1).astype(np.float32)

    kw = dict(sigma=8e-4, lam=0.037, dz=0.5)
    psi_d = to_device_complex(psi)
    out2 = to_numpy(fused_multislice_odd(                  # d=11 kernel
        psi_d, jnp.asarray(pot), kxs, kxs, **kw))
    out1 = to_numpy(fused_multislice_odd(                  # d=3 kernel
        psi_d[:1], jnp.asarray(pot), kxs, kxs, **kw))
    assert _residual(out1[0], out2[0]) < 1e-6

"""Direct A/B parity against the ACTUAL reference implementation.

Every other test in this suite proves parity against the in-tree float64
oracle (tests/oracle.py). This module closes the loop: it imports the real
h-walk/PySlice sources from /root/reference (PyTorch backend, complex128 on
CPU) and compares pyslice_tpu's numbers to the reference's actual outputs at
the reference's own regression bar — the scale-invariant magnitude residual

    dz = sum((|F| - |D|)**2) / sum(|F|**2)  <=  1e-6

(/root/reference/src/unittests/00_probe.py:21-28 and 5 siblings). Most checks
here pass at ~1e-20 because both sides run float64/complex128 on CPU.

Covered surfaces (mirroring the reference's own unittests):
  probe construction across apertures on a non-square grid   (00_probe.py)
  k-space phase-ramp probe shifting, incl. sign (quirk #14)   (03_manyprobes.py)
  defocus, positive and reference-compat negative (quirk #13) (07_defocus.py)
  Potential rasterization on a thermal hBN frame              (01_potentials.py)
  slice-bin edge rules (potentials.py:302-307)
  single- and batched-probe Propagate                         (02/03)
  full calculator -> WFData (incl. nominal k axes, quirk #12) (05_tacaw.py)
  TACAW spectrum / diffraction / spectral methods             (05_tacaw.py)
  HAADF calculateADF                                          (04_haadf.py)
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

# --- reference import ---------------------------------------------------------

import os
from pathlib import Path

REF = os.environ.get("PYSLICE_REFERENCE_DIR", "/root/reference")
if not (Path(REF) / "src" / "multislice" / "multislice.py").exists():
    pytest.skip(f"reference checkout not found at {REF} "
                "(set PYSLICE_REFERENCE_DIR)", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

from src.multislice.multislice import (            # noqa: E402
    Probe as RefProbe,
    Propagate as RefPropagate,
    create_batched_probes as ref_create_batched_probes,
    probe_grid as ref_probe_grid,
)
from src.multislice.potentials import Potential as RefPotential  # noqa: E402
from src.multislice.calculators import MultisliceCalculator as RefCalculator  # noqa: E402
from src.multislice.trajectory import Trajectory as RefTrajectory  # noqa: E402
from src.postprocessing.tacaw_data import TACAWData as RefTACAWData  # noqa: E402
from src.postprocessing.haadf_data import HAADFData as RefHAADFData  # noqa: E402

from pyslice_tpu.analysis.haadf import HAADFData  # noqa: E402
from pyslice_tpu.analysis.tacaw import TACAWData  # noqa: E402
from pyslice_tpu.engine.calculator import MultisliceCalculator  # noqa: E402
from pyslice_tpu.physics.potential import Potential  # noqa: E402
from pyslice_tpu.physics.probe import (  # noqa: E402
    Probe,
    create_batched_probes,
    probe_grid,
)
from pyslice_tpu.physics.propagate import Propagate  # noqa: E402

from tests.fixtures import hbn_thermal  # noqa: E402

PREC = "double"   # complex128 everywhere, matching reference-on-CPU


def t2np(x):
    """torch tensor | ndarray -> ndarray."""
    if hasattr(x, "cpu"):
        return x.cpu().numpy()
    return np.asarray(x)


def ref_residual(ref, mine) -> float:
    """The reference's own golden-file metric (00_probe.py:21-28):
    relative residual of magnitudes."""
    F = np.abs(t2np(ref)).astype(np.float64)
    D = np.abs(np.asarray(mine)).astype(np.float64)
    denom = np.sum(F ** 2)
    if denom == 0.0:
        return float(np.sum(D ** 2))
    return float(np.sum((F - D) ** 2) / denom)


def assert_ref_parity(ref, mine, bound=1e-6, complex_too=True):
    ref_np = t2np(ref)
    mine_np = np.asarray(mine)
    assert ref_np.shape == mine_np.shape, (ref_np.shape, mine_np.shape)
    dz = ref_residual(ref_np, mine_np)
    assert dz <= bound, f"magnitude residual {dz:.3e} > {bound:.0e}"
    if complex_too:
        # Stronger than the reference bar: full complex relative residual.
        denom = np.sum(np.abs(ref_np) ** 2)
        if denom > 0:
            dc = float(np.sum(np.abs(ref_np - mine_np) ** 2) / denom)
            assert dc <= bound, f"complex residual {dc:.3e} > {bound:.0e}"


# --- shared geometry (small grids: the reference rasterizer is Python loops) --

LX, LY = 10.016, 8.674137289
SAMPLING = 0.25


def axes_2d(lx=LX, ly=LY, sampling=SAMPLING):
    nx = int(lx / sampling) + 1
    ny = int(ly / sampling) + 1
    xs = np.linspace(0.0, lx, nx, endpoint=False)
    ys = np.linspace(0.0, ly, ny, endpoint=False)
    return xs, ys


@pytest.fixture(scope="module")
def thermal_traj():
    # 2x2 hBN supercell + 4 synthetic thermal frames, orthorhombic box
    return hbn_thermal(n_frames=4, sigma=0.05, nx=2, ny=2, seed=3)


def as_ref_traj(traj) -> RefTrajectory:
    return RefTrajectory(
        atom_types=np.asarray(traj.atom_types),
        positions=np.asarray(traj.positions, dtype=np.float64),
        velocities=np.asarray(traj.velocities, dtype=np.float64),
        box_matrix=np.asarray(traj.box_matrix, dtype=np.float64),
        timestep=traj.timestep,
    )


# ------------------------------------------------------------------ probes ---


def test_probe_parity_across_apertures():
    """Mirror of 00_probe.py:7-19: several apertures on a non-square grid."""
    xs, ys = axes_2d()
    for mrad in (0.0, 1.0, 5.0, 15.0, 30.0):
        ref = RefProbe(xs, ys, mrad, 100e3)
        mine = Probe(xs, ys, mrad, 100e3, precision=PREC)
        assert_ref_parity(ref.array, np.asarray(mine.array))


def test_probe_wavelength_matches_reference():
    from src.multislice.multislice import wavelength as ref_wavelength
    from pyslice_tpu.core.constants import wavelength
    for eV in (60e3, 100e3, 300e3):
        assert wavelength(eV) == pytest.approx(ref_wavelength(eV), rel=1e-14)


def test_batched_probe_shift_sign_parity():
    """Quirk #14: the shift ramp is exp(+2*pi*i k.r) (multislice.py:221-223).
    An asymmetric position would expose a sign flip immediately."""
    xs, ys = axes_2d()
    positions = [(3.2, 4.7), (7.9, 2.13), (0.0, 0.0), (LX / 2, LY / 2)]
    ref = ref_create_batched_probes(RefProbe(xs, ys, 25.0, 100e3), positions)
    mine = create_batched_probes(Probe(xs, ys, 25.0, 100e3, precision=PREC),
                                 positions)
    assert_ref_parity(ref.array, np.asarray(mine.array))


def test_probe_grid_parity():
    ref = ref_probe_grid((1.0, 9.0), (2.0, 7.0), 4, 3)
    mine = probe_grid((1.0, 9.0), (2.0, 7.0), 4, 3)
    np.testing.assert_allclose(mine, ref, rtol=0, atol=0)


def test_defocus_positive_parity():
    """07_defocus.py surface, dz > 0 (identical semantics both sides)."""
    xs, ys = axes_2d()
    ref = RefProbe(xs, ys, 20.0, 100e3)
    ref.defocus(500.0)
    mine = Probe(xs, ys, 20.0, 100e3, precision=PREC)
    mine.defocus(500.0)
    assert_ref_parity(ref.array, np.asarray(mine.array))


def test_defocus_negative_compat_parity():
    """Quirk #13: the reference's dz < 0 branch double-negates, so
    defocus(-d) behaves like defocus(+d) (multislice.py:186-190).
    compat_reference=True replicates that for bit-parity studies."""
    xs, ys = axes_2d()
    ref = RefProbe(xs, ys, 20.0, 100e3)
    ref.defocus(-500.0)
    mine = Probe(xs, ys, 20.0, 100e3, precision=PREC)
    mine.defocus(-500.0, compat_reference=True)
    assert_ref_parity(ref.array, np.asarray(mine.array))
    # Without the flag the semantics differ by design (back-propagation):
    other = Probe(xs, ys, 20.0, 100e3, precision=PREC)
    import pyslice_tpu.physics.probe as probe_mod
    probe_mod._warned_negative_defocus = False   # warning is once-per-process
    with pytest.warns(UserWarning, match="back-propagates"):
        other.defocus(-500.0)
    # Back-propagation conjugates the phases, so magnitudes agree — the
    # divergence is in the complex values.
    ref_np, other_np = t2np(ref.array), np.asarray(other.array)
    dc = np.sum(np.abs(ref_np - other_np) ** 2) / np.sum(np.abs(ref_np) ** 2)
    assert dc > 1e-6


# --------------------------------------------------------------- potential ---


def test_potential_parity_thermal_hbn(thermal_traj):
    """01_potentials.py surface: rasterize a displaced hBN frame."""
    box = np.asarray(thermal_traj.box_matrix)
    nx = int(box[0, 0] / SAMPLING) + 1
    ny = int(box[1, 1] / SAMPLING) + 1
    nz = int(box[2, 2] / 0.5) + 1
    xs = np.linspace(0.0, box[0, 0], nx, endpoint=False)
    ys = np.linspace(0.0, box[1, 1], ny, endpoint=False)
    zs = np.linspace(0.0, box[2, 2], nz, endpoint=False)
    pos = np.asarray(thermal_traj.positions[1], dtype=np.float64)
    types = np.asarray(thermal_traj.atom_types)

    ref = RefPotential(xs, ys, zs, pos, list(types), kind="kirkland")
    mine = Potential(xs, ys, zs, pos, types, kind="kirkland", precision=PREC)
    assert_ref_parity(ref.array, np.asarray(mine.array), complex_too=False)
    # Full signed comparison (potential is real)
    np.testing.assert_allclose(np.asarray(mine.array), t2np(ref.array),
                               rtol=0, atol=1e-9 * np.abs(t2np(ref.array)).max())


def test_potential_parity_element_name_types(thermal_traj):
    """The calculator passes element-name strings (calculators.py:267-272)."""
    xs, ys = axes_2d(6.0, 6.0, 0.3)
    zs = np.linspace(0.0, 4.0, 5, endpoint=False)
    pos = np.array([[1.3, 2.2, 0.7], [4.1, 0.9, 1.8], [2.0, 5.0, 3.9]])
    ref = RefPotential(xs, ys, zs, pos, ["B", "N", "B"], kind="kirkland")
    mine = Potential(xs, ys, zs, pos, ["B", "N", "B"], kind="kirkland",
                     precision=PREC)
    assert_ref_parity(ref.array, np.asarray(mine.array), complex_too=False)


def test_slice_bin_edges_parity():
    """Atoms dead on the bin boundaries (potentials.py:302-307): bin s covers
    [coord_s - dz/2, coord_s + dz/2) except bin 0 starts at 0 and the last
    bin extends to coord_last + dz. Edge atoms must land identically."""
    xs, ys = axes_2d(5.0, 5.0, 0.5)
    zs = np.linspace(0.0, 3.0, 6, endpoint=False)   # dz = 0.5
    # z values: exact lower edges, exact upper edges, first/last extremes
    z_atoms = [0.0, 0.25, 0.7499999, 0.75, 1.25, 2.75, 2.9999, 3.49]
    pos = np.array([[2.0 + 0.1 * i, 2.5, z] for i, z in enumerate(z_atoms)])
    types = [5] * len(z_atoms)
    ref = RefPotential(xs, ys, zs, pos, types, kind="kirkland")
    mine = Potential(xs, ys, zs, pos, types, kind="kirkland", precision=PREC)
    # Per-slice comparison so a mis-binned atom cannot hide
    ref_arr, mine_arr = t2np(ref.array), np.asarray(mine.array)
    for s in range(len(zs)):
        dz = ref_residual(ref_arr[:, :, s], mine_arr[:, :, s])
        assert dz <= 1e-6, f"slice {s}: residual {dz:.3e}"


# --------------------------------------------------------------- propagate ---


@pytest.fixture(scope="module")
def small_system(thermal_traj):
    """Shared (xs, ys, zs, potential pair) for propagate tests."""
    box = np.asarray(thermal_traj.box_matrix)
    xs, ys = axes_2d(float(box[0, 0]), float(box[1, 1]), SAMPLING)
    nz = int(box[2, 2] / 0.5) + 1
    zs = np.linspace(0.0, box[2, 2], nz, endpoint=False)
    pos = np.asarray(thermal_traj.positions[0], dtype=np.float64)
    types = np.asarray(thermal_traj.atom_types)
    ref_pot = RefPotential(xs, ys, zs, pos, list(types), kind="kirkland")
    my_pot = Potential(xs, ys, zs, pos, types, kind="kirkland", precision=PREC)
    return xs, ys, zs, ref_pot, my_pot


def test_propagate_single_probe_parity(small_system):
    """02_propagate.py surface: one convergent probe through hBN."""
    xs, ys, zs, ref_pot, my_pot = small_system
    ref_probe = RefProbe(xs, ys, 5.0, 100e3)
    ref_exit = RefPropagate(ref_probe, ref_pot)
    mine = Propagate(Probe(xs, ys, 5.0, 100e3, precision=PREC), my_pot)
    assert_ref_parity(ref_exit, np.asarray(mine))


def test_propagate_batched_parity(small_system):
    """03_manyprobes.py surface: batched probes, incl. k-space conversion."""
    xs, ys, zs, ref_pot, my_pot = small_system
    positions = ref_probe_grid((2.0, 8.0), (2.0, 7.0), 3, 2)
    ref_batch = ref_create_batched_probes(RefProbe(xs, ys, 25.0, 100e3),
                                          positions)
    ref_exit = RefPropagate(ref_batch, ref_pot)
    ref_k = torch.fft.fftshift(torch.fft.fft2(ref_exit, dim=(-2, -1)),
                               dim=(-2, -1))

    my_batch = create_batched_probes(Probe(xs, ys, 25.0, 100e3, precision=PREC),
                                     positions)
    my_exit = np.asarray(Propagate(my_batch, my_pot))
    assert_ref_parity(ref_exit, my_exit)
    my_k = np.fft.fftshift(np.fft.fft2(my_exit, axes=(-2, -1)), axes=(-2, -1))
    assert_ref_parity(ref_k, my_k)


def test_propagate_plane_wave_parity(small_system):
    """05_tacaw.py runs a plane-wave probe (mrad=0)."""
    xs, ys, zs, ref_pot, my_pot = small_system
    ref_exit = RefPropagate(RefProbe(xs, ys, 0.0, 60e3), ref_pot)
    mine = Propagate(Probe(xs, ys, 0.0, 60e3, precision=PREC), my_pot)
    assert_ref_parity(ref_exit, np.asarray(mine))


# -------------------------------------------------- calculator -> analysis ---


@pytest.fixture(scope="module")
def ab_wfdata(thermal_traj, tmp_path_factory):
    """Run BOTH calculators end-to-end on the same 4-frame trajectory."""
    import os
    tmp = tmp_path_factory.mktemp("ref_psi")
    cwd = os.getcwd()
    os.chdir(tmp)    # the reference writes psi_data/ relative to CWD
    try:
        ref_calc = RefCalculator()
        ref_calc.setup(as_ref_traj(thermal_traj), aperture=0.0,
                       voltage_eV=60e3, slice_thickness=0.5,
                       sampling=SAMPLING)
        ref_wf = ref_calc.run()
    finally:
        os.chdir(cwd)

    calc = MultisliceCalculator(precision=PREC)
    calc.setup(thermal_traj, aperture=0.0, voltage_eV=60e3,
               slice_thickness=0.5, sampling=SAMPLING, use_cache=False)
    my_wf = calc.run(progress=False)
    return ref_wf, my_wf


def test_calculator_wfdata_parity(ab_wfdata):
    """05_tacaw.py surface: the full wavefunction_data block and the exported
    axes, including the nominal-sampling k-axis quirk (#12,
    calculators.py:218-219)."""
    ref_wf, my_wf = ab_wfdata
    # The reference's exported axes are float32 (torch.fft.fftfreq default
    # dtype); ours are float64 — compare at float32 resolution.
    np.testing.assert_allclose(my_wf.kxs, t2np(ref_wf.kxs), rtol=1e-6)
    np.testing.assert_allclose(my_wf.kys, t2np(ref_wf.kys), rtol=1e-6)
    np.testing.assert_allclose(my_wf.time, t2np(ref_wf.time), rtol=1e-14)
    assert_ref_parity(ref_wf.wavefunction_data, my_wf.wavefunction_data)


def test_tacaw_parity(ab_wfdata):
    """TACAW spectrum / diffraction / spectral_diffraction / dispersion at the
    reference's 1e-6 bar (05_tacaw.py:37-44)."""
    ref_wf, my_wf = ab_wfdata
    ref_t = RefTACAWData(ref_wf)
    my_t = TACAWData(my_wf)

    np.testing.assert_allclose(my_t.frequencies, t2np(ref_t.frequencies),
                               rtol=1e-12)
    assert_ref_parity(ref_t.intensity, my_t.intensity, complex_too=False)
    for probe_index in (None, 0):
        assert_ref_parity(ref_t.spectrum(probe_index),
                          my_t.spectrum(probe_index), complex_too=False)
        assert_ref_parity(ref_t.diffraction(probe_index),
                          my_t.diffraction(probe_index), complex_too=False)
    freq = float(t2np(ref_t.frequencies)[len(t2np(ref_t.frequencies)) // 2 + 1])
    assert_ref_parity(ref_t.spectral_diffraction(freq),
                      my_t.spectral_diffraction(freq), complex_too=False)
    kpath = np.linspace(0.0, 1.5, 7)
    ref_disp = ref_t.dispersion(kpath, np.zeros_like(kpath))
    my_disp = my_t.dispersion(kpath, np.zeros_like(kpath))
    assert_ref_parity(ref_disp, my_disp, complex_too=False)


def test_haadf_parity(thermal_traj, tmp_path, monkeypatch):
    """04_haadf.py surface: aperture 25 mrad, 3x3 scan grid, 2 frames,
    calculateADF(collection_angle=45)."""
    import os
    traj2 = thermal_traj.slice_timesteps(np.array([0, 1]))
    box = np.asarray(traj2.box_matrix)
    scan = ref_probe_grid((2.0, 8.0), (2.0, 7.0), 3, 3)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ref_calc = RefCalculator()
        ref_calc.setup(as_ref_traj(traj2), aperture=25.0, voltage_eV=100e3,
                       slice_thickness=0.5, sampling=SAMPLING,
                       probe_positions=scan)
        ref_wf = ref_calc.run()
    finally:
        os.chdir(cwd)
    ref_adf = RefHAADFData(ref_wf).calculateADF(collection_angle=45)

    calc = MultisliceCalculator(precision=PREC)
    calc.setup(traj2, aperture=25.0, voltage_eV=100e3, slice_thickness=0.5,
               sampling=SAMPLING, probe_positions=scan, use_cache=False)
    my_wf = calc.run(progress=False)
    # intensity=False is the default: reference amplitude semantics (quirk #11)
    my_adf = HAADFData(my_wf).calculateADF(collection_angle=45)
    assert_ref_parity(ref_adf, my_adf, complex_too=False)

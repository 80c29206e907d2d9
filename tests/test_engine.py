"""Calculator pipeline + TACAW/HAADF analysis vs the oracle.

Covers the reference regression scope of 04_haadf / 05_tacaw.
"""

import numpy as np
import pytest

from pyslice_tpu.analysis.haadf import HAADFData
from pyslice_tpu.analysis.tacaw import TACAWData
from pyslice_tpu.analysis.wf_data import WFData
from pyslice_tpu.core.dtypes import DOUBLE
from pyslice_tpu.engine.calculator import MultisliceCalculator
from pyslice_tpu.physics.probe import probe_grid
from tests import oracle
from tests.fixtures import hbn_thermal

TOL = 1e-6

SAMPLING = 0.25
SLICE_T = 0.8


@pytest.fixture(scope="module")
def thermal_traj():
    return hbn_thermal(n_frames=6, sigma=0.05, nx=2, ny=2, seed=3)


@pytest.fixture(scope="module")
def wf(thermal_traj):
    calc = MultisliceCalculator(precision=DOUBLE)
    calc.setup(thermal_traj, aperture=0, voltage_eV=100e3,
               sampling=SAMPLING, slice_thickness=SLICE_T, use_cache=False)
    return calc.run(progress=False)


@pytest.fixture(scope="module")
def wf_oracle(thermal_traj):
    return oracle.oracle_pipeline(thermal_traj, aperture=0,
                                  voltage_eV=100e3, sampling=SAMPLING,
                                  slice_thickness=SLICE_T)


class TestCalculator:
    def test_pipeline_vs_oracle(self, wf, wf_oracle):
        assert wf.wavefunction_data.shape == wf_oracle.shape
        assert oracle.residual(wf.wavefunction_data, wf_oracle) < 1e-18

    def test_k_axes_reference_quirk(self, wf, thermal_traj):
        # exported axes use the requested sampling (calculators.py:218-219)
        nx = wf.wavefunction_data.shape[2]
        np.testing.assert_allclose(
            wf.kxs, np.fft.fftshift(np.fft.fftfreq(nx, SAMPLING)))

    def test_time_axis(self, wf, thermal_traj):
        np.testing.assert_allclose(
            wf.time, np.arange(thermal_traj.n_frames) * thermal_traj.timestep)

    def test_default_probe_is_center(self, wf, thermal_traj):
        box = thermal_traj.box_matrix
        np.testing.assert_allclose(wf.probe_positions,
                                   [(box[0, 0] / 2, box[1, 1] / 2)])

    def test_probe_batching_equivalence(self, thermal_traj):
        """batch_size chunking must not change results (ref bug #9: unused)."""
        pg = probe_grid([1, 3], [1, 3], 2, 2)
        short = thermal_traj.slice_timesteps([0, 1])
        outs = []
        for bs in (None, 3):
            c = MultisliceCalculator(precision=DOUBLE)
            c.setup(short, aperture=20, voltage_eV=100e3, sampling=SAMPLING,
                    slice_thickness=SLICE_T, probe_positions=pg,
                    batch_size=bs, use_cache=False)
            outs.append(c.run(progress=False).wavefunction_data)
        np.testing.assert_allclose(outs[0], outs[1], rtol=1e-12)

    def test_defocus_applied(self, thermal_traj):
        """setup(defocus=...) must change the result (ref bug #8: ignored)."""
        short = thermal_traj.slice_timesteps([0])
        results = []
        for dz in (0.0, 200.0):
            c = MultisliceCalculator(precision=DOUBLE)
            c.setup(short, aperture=20, voltage_eV=100e3, sampling=SAMPLING,
                    slice_thickness=SLICE_T, defocus=dz, use_cache=False)
            results.append(c.run(progress=False).wavefunction_data)
        assert not np.allclose(np.abs(results[0]), np.abs(results[1]))

    def test_record_layers(self, thermal_traj):
        short = thermal_traj.slice_timesteps([0, 1])
        c = MultisliceCalculator(precision=DOUBLE)
        c.setup(short, aperture=0, voltage_eV=100e3, sampling=SAMPLING,
                slice_thickness=SLICE_T, use_cache=False)
        nz = c.nz
        c2 = MultisliceCalculator(precision=DOUBLE)
        c2.setup(short, aperture=0, voltage_eV=100e3, sampling=SAMPLING,
                 slice_thickness=SLICE_T, record_layers=[nz // 2, nz - 1],
                 use_cache=False)
        wf2 = c2.run(progress=False)
        assert wf2.wavefunction_data.shape[-1] == 2
        np.testing.assert_array_equal(wf2.layer, [nz // 2, nz - 1])
        # last recorded layer == default exit wave
        wf1 = c.run(progress=False)
        np.testing.assert_allclose(wf2.wavefunction_data[..., 1],
                                   wf1.wavefunction_data[..., 0], rtol=1e-12)

    def test_cache_roundtrip(self, thermal_traj, tmp_path):
        short = thermal_traj.slice_timesteps([0, 1])
        a = MultisliceCalculator(precision=DOUBLE)
        a.setup(short, sampling=SAMPLING, slice_thickness=SLICE_T,
                cache_root=str(tmp_path))
        wa = a.run(progress=False)
        assert any(tmp_path.rglob("frame_*.npy"))
        b = MultisliceCalculator(precision=DOUBLE)
        b.setup(short, sampling=SAMPLING, slice_thickness=SLICE_T,
                cache_root=str(tmp_path))
        wb = b.run(progress=False)
        np.testing.assert_array_equal(wa.wavefunction_data,
                                      wb.wavefunction_data)

    def test_cleanup_temp_files(self, thermal_traj, tmp_path):
        """Reference bug #3: cleanup crashed on an undefined variable."""
        short = thermal_traj.slice_timesteps([0])
        c = MultisliceCalculator(precision=DOUBLE)
        c.setup(short, sampling=SAMPLING, slice_thickness=SLICE_T,
                cache_root=str(tmp_path), cleanup_temp_files=True)
        c.run(progress=False)
        assert not any(tmp_path.rglob("frame_*.npy"))

    def test_wfdata_save_load(self, wf, tmp_path):
        wf.save(tmp_path / "wf.npz")
        loaded = WFData.load(tmp_path / "wf.npz")
        np.testing.assert_array_equal(loaded.wavefunction_data,
                                      wf.wavefunction_data)
        np.testing.assert_allclose(loaded.kxs, wf.kxs)
        assert loaded.probe.eV == wf.probe.eV


class TestTACAW:
    def test_intensity_vs_oracle(self, wf, wf_oracle):
        tac = TACAWData(wf)
        want = oracle.oracle_time_fft(wf_oracle[:, :, :, :, 0])
        assert tac.intensity.shape == want.shape
        assert oracle.residual(np.sqrt(tac.intensity), np.sqrt(want)) < 1e-18

    def test_frequencies(self, wf, thermal_traj):
        tac = TACAWData(wf)
        n = thermal_traj.n_frames
        want = np.fft.fftshift(np.fft.fftfreq(n, thermal_traj.timestep))
        np.testing.assert_allclose(tac.frequencies, want)

    def test_parseval(self, wf):
        """Sum over frequency of |FFT|^2 == n_t * sum over t |x - mean|^2."""
        tac = TACAWData(wf)
        wf0 = wf.wavefunction_data[:, :, :, :, 0]
        centered = wf0 - wf0.mean(axis=1, keepdims=True)
        n_t = wf0.shape[1]
        lhs = tac.intensity.sum(axis=1)
        rhs = n_t * np.sum(np.abs(centered) ** 2, axis=1)
        np.testing.assert_allclose(lhs, rhs, rtol=1e-9)

    def test_method_semantics(self, wf):
        tac = TACAWData(wf)
        n_probes, n_freq, nkx, nky = tac.intensity.shape
        # spectrum: sum over k; None averages probes
        np.testing.assert_allclose(tac.spectrum(0),
                                   tac.intensity[0].sum(axis=(1, 2)))
        np.testing.assert_allclose(
            tac.spectrum(None),
            np.mean([tac.spectrum(i) for i in range(n_probes)], axis=0))
        # diffraction: sum over freq
        np.testing.assert_allclose(tac.diffraction(0),
                                   tac.intensity[0].sum(axis=0))
        # spectral_diffraction: nearest frequency
        f = tac.frequencies[2] + 1e-4
        np.testing.assert_allclose(tac.spectral_diffraction(f, 0),
                                   tac.intensity[0, 2])
        # spectrum_image: scalar per probe at nearest freq
        si = tac.spectrum_image(f)
        assert si.shape == (n_probes,)
        np.testing.assert_allclose(si[0], tac.intensity[0, 2].sum())
        # masked_spectrum with all-ones mask == spectrum
        mask = np.ones((nkx, nky))
        np.testing.assert_allclose(tac.masked_spectrum(mask, 0),
                                   tac.spectrum(0))
        # dispersion nearest-k lookup
        disp = tac.dispersion(np.array([tac.kxs[1] + 1e-6]),
                              np.array([tac.kys[3] - 1e-6]), probe_index=0)
        np.testing.assert_allclose(disp[:, 0], tac.intensity[0, :, 1, 3])

    def test_mask_shape_error(self, wf):
        tac = TACAWData(wf)
        with pytest.raises(ValueError, match="Mask shape"):
            tac.masked_spectrum(np.ones((2, 2)))

    def test_kx_ky_aliases(self, wf):
        tac = TACAWData(wf)
        np.testing.assert_array_equal(tac.kx, tac.kxs)
        np.testing.assert_array_equal(tac.ky, tac.kys)


class TestHAADF:
    @pytest.fixture(scope="class")
    def haadf_wf(self, thermal_traj):
        pg = probe_grid([1, 4], [1, 4], 3, 4)
        short = thermal_traj.slice_timesteps([0, 1, 2])
        c = MultisliceCalculator(precision=DOUBLE)
        c.setup(short, aperture=30, voltage_eV=100e3, sampling=SAMPLING,
                slice_thickness=SLICE_T, probe_positions=pg, use_cache=False)
        return c.run(progress=False)

    def test_adf_vs_naive_loop(self, haadf_wf):
        h = HAADFData(haadf_wf)
        adf = h.calculateADF(collection_angle=45)
        assert adf.shape == (3, 4)
        # naive oracle: per scan point, nearest probe, amplitude sum
        positions = np.asarray(haadf_wf.probe_positions, dtype=float)
        xs = np.array(sorted(set(positions[:, 0])))
        ys = np.array(sorted(set(positions[:, 1])))
        q = np.sqrt(haadf_wf.kxs[:, None] ** 2 + haadf_wf.kys[None, :] ** 2)
        mask = (q > (45e-3) / haadf_wf.probe.wavelength).astype(float)
        want = np.zeros((len(xs), len(ys)))
        for i, x in enumerate(xs):
            for j, y in enumerate(ys):
                d = np.sqrt(((positions - [x, y]) ** 2).sum(axis=1))
                p = int(np.argmin(d))
                exits = haadf_wf.wavefunction_data[p, :, :, :, -1]
                want[i, j] = np.mean(
                    np.sum(np.abs(exits * mask[None]), axis=(1, 2)))
        np.testing.assert_allclose(adf, want, rtol=1e-10)

    def test_adf_alias(self, haadf_wf):
        h = HAADFData(haadf_wf)
        np.testing.assert_array_equal(h.ADF(45), h.calculateADF(45))

    def test_intensity_option(self, haadf_wf):
        h = HAADFData(haadf_wf)
        amp = h.calculateADF(45)
        inten = h.calculateADF(45, intensity=True)
        assert not np.allclose(amp, inten)

    def test_accepts_list_positions(self, haadf_wf):
        """Reference requires an ndarray (haadf_data.py:44); we accept lists."""
        wf2 = WFData(probe_positions=[tuple(p) for p in
                                      np.asarray(haadf_wf.probe_positions)],
                     time=haadf_wf.time, kxs=haadf_wf.kxs, kys=haadf_wf.kys,
                     layer=haadf_wf.layer,
                     wavefunction_data=haadf_wf.wavefunction_data,
                     probe=haadf_wf.probe)
        h = HAADFData(wf2)
        assert h.calculateADF(45).shape == (3, 4)


class TestDeviceOutput:
    """device_output=True keeps exit waves on device end-to-end (VERDICT
    item 3); results must be identical to the host path, and every analysis
    method must consume the device WFData directly."""

    @pytest.fixture(scope="class")
    def wf_pair(self, thermal_traj):
        host_calc = MultisliceCalculator(precision=DOUBLE)
        host_calc.setup(thermal_traj, aperture=0, voltage_eV=100e3,
                        sampling=SAMPLING, slice_thickness=SLICE_T,
                        use_cache=False)
        dev_calc = MultisliceCalculator(precision=DOUBLE)
        dev_calc.setup(thermal_traj, aperture=0, voltage_eV=100e3,
                       sampling=SAMPLING, slice_thickness=SLICE_T,
                       device_output=True)
        return host_calc.run(progress=False), dev_calc.run(progress=False)

    def test_wf_identical(self, wf_pair):
        import jax
        host_wf, dev_wf = wf_pair
        assert isinstance(dev_wf.wavefunction_data, jax.Array)
        from pyslice_tpu.utils.host import to_numpy
        np.testing.assert_allclose(to_numpy(dev_wf.wavefunction_data),
                                   host_wf.wavefunction_data,
                                   rtol=1e-12, atol=1e-12)

    def test_tacaw_methods_on_device_wf(self, wf_pair):
        import jax
        host_wf, dev_wf = wf_pair
        th = TACAWData(host_wf)
        td = TACAWData(dev_wf)
        assert isinstance(td.intensity, jax.Array)
        np.testing.assert_allclose(td.spectrum(), th.spectrum(), rtol=1e-10)
        np.testing.assert_allclose(td.spectrum(0), th.spectrum(0), rtol=1e-10)
        np.testing.assert_allclose(td.diffraction(), th.diffraction(),
                                   rtol=1e-10)
        f = float(th.frequencies[2])
        np.testing.assert_allclose(td.spectral_diffraction(f),
                                   th.spectral_diffraction(f), rtol=1e-10)
        np.testing.assert_allclose(td.spectrum_image(f), th.spectrum_image(f),
                                   rtol=1e-10)
        mask = (np.add.outer(np.arange(len(td.kxs)) % 2,
                             np.arange(len(td.kys)) % 2) > 0).astype(float)
        np.testing.assert_allclose(td.masked_spectrum(mask),
                                   th.masked_spectrum(mask), rtol=1e-10)
        kp = np.linspace(0, 1.0, 5)
        np.testing.assert_allclose(td.dispersion(kp, kp * 0),
                                   th.dispersion(kp, kp * 0), rtol=1e-10)
        # results are host arrays (reference API contract)
        assert isinstance(td.spectrum(), np.ndarray)
        assert isinstance(td.diffraction(), np.ndarray)

    def test_haadf_on_device_wf(self, thermal_traj):
        pg = probe_grid((1.0, 4.0), (1.0, 4.0), 2, 2)
        outs = []
        for dev in (False, True):
            calc = MultisliceCalculator(precision=DOUBLE)
            calc.setup(thermal_traj.slice_timesteps(np.array([0, 1])),
                       aperture=25, voltage_eV=100e3, sampling=SAMPLING,
                       slice_thickness=SLICE_T, probe_positions=pg,
                       use_cache=False, device_output=dev)
            outs.append(HAADFData(calc.run(progress=False)).calculateADF(45))
        np.testing.assert_allclose(outs[1], outs[0], rtol=1e-12)
        assert isinstance(outs[1], np.ndarray)

    def test_save_device_wf(self, wf_pair, tmp_path):
        _, dev_wf = wf_pair
        dev_wf.save(tmp_path / "wf.npz")
        loaded = WFData.load(tmp_path / "wf.npz")
        from pyslice_tpu.utils.host import to_numpy
        np.testing.assert_allclose(loaded.wavefunction_data,
                                   to_numpy(dev_wf.wavefunction_data))


def test_cache_key_distinguishes_grid_options(thermal_traj, tmp_path):
    """fast_grid / slice_axis change results and must not share cache keys."""
    short = thermal_traj.slice_timesteps([0])
    keys = set()
    for kw in ({}, {"fast_grid": True}, {"slice_axis": 1}):
        c = MultisliceCalculator(precision=DOUBLE)
        c.setup(short, sampling=SAMPLING, slice_thickness=SLICE_T,
                cache_root=str(tmp_path), **kw)
        keys.add(c.output_dir.name)
    assert len(keys) == 3, keys


def test_cache_key_distinguishes_positions(thermal_traj, tmp_path):
    """Different thermal realizations must not share a frame cache."""
    a = thermal_traj.slice_timesteps([0])
    moved = a.positions.copy()
    moved[0, 0, 0] += 0.25
    import pyslice_tpu as pt
    b = pt.Trajectory(a.atom_types, moved, a.velocities, a.box_matrix,
                      a.timestep)
    keys = []
    for t in (a, b):
        c = MultisliceCalculator(precision=DOUBLE)
        c.setup(t, sampling=SAMPLING, slice_thickness=SLICE_T,
                cache_root=str(tmp_path))
        keys.append(c.output_dir.name)
    assert keys[0] != keys[1]


class TestBlockedPrograms:
    """Partial trailing blocks must not compile a second program shape:
    the device path overlaps the tail into a full block, the host path
    pads positions — both bit-identical to the unblocked run (each block
    frame is a deterministic replay of the same per-frame function)."""

    def _spy_shapes(self, monkeypatch):
        import pyslice_tpu.engine.calculator as calc_mod
        real_sf = calc_mod.simulate_frames
        real_into = calc_mod.simulate_frames_into
        shapes = []

        def spy_sf(positions, probes, spec):
            shapes.append(tuple(positions.shape))
            return real_sf(positions, probes, spec)

        def spy_into(out, i0, positions, probes, spec):
            shapes.append(tuple(positions.shape))
            return real_into(out, i0, positions, probes, spec)

        monkeypatch.setattr(calc_mod, "simulate_frames", spy_sf)
        monkeypatch.setattr(calc_mod, "simulate_frames_into", spy_into)
        return shapes

    def test_device_tail_overlap_identical(self, thermal_traj, wf,
                                           monkeypatch):
        shapes = self._spy_shapes(monkeypatch)
        calc = MultisliceCalculator(precision=DOUBLE)
        calc.setup(thermal_traj, aperture=0, voltage_eV=100e3,
                   sampling=SAMPLING, slice_thickness=SLICE_T,
                   use_cache=False, device_output=True, frame_block=4)
        out = calc.run(progress=False)   # 6 frames -> [0:4] + overlap [2:6]
        assert shapes == [(4,) + thermal_traj.positions.shape[1:]] * 2
        np.testing.assert_allclose(np.asarray(out.wavefunction_data),
                                   wf.wavefunction_data,
                                   rtol=1e-12, atol=1e-12)

    def test_host_tail_padding_identical(self, thermal_traj, wf,
                                         monkeypatch):
        shapes = self._spy_shapes(monkeypatch)
        calc = MultisliceCalculator(precision=DOUBLE)
        calc.setup(thermal_traj, aperture=0, voltage_eV=100e3,
                   sampling=SAMPLING, slice_thickness=SLICE_T,
                   use_cache=False, frame_block=4)
        out = calc.run(progress=False)   # chunks [0..3] + [4,5] padded to 4
        assert shapes == [(4,) + thermal_traj.positions.shape[1:]] * 2
        np.testing.assert_allclose(out.wavefunction_data,
                                   wf.wavefunction_data,
                                   rtol=1e-12, atol=1e-12)


class TestResidentMemoryEstimate:
    """setup(device_output=True) warns loud-and-early when the resident
    exit-wave array approaches device memory, pointing at the streaming
    engines (round 5; the alternative is an opaque OOM mid-run, or — on
    the relayed device here — a doomed complex host transfer)."""

    def test_warns_above_half_hbm(self, caplog):
        # 251x261 grid x 64 probes x 600 frames ~ 20 GiB resident estimate
        traj = hbn_thermal(n_frames=600, sigma=0.05, nx=10, ny=6, seed=1)
        pg = probe_grid([1.0, 20.0], [1.0, 20.0], 8, 8)   # 64 probes
        calc = MultisliceCalculator()
        with caplog.at_level("WARNING"):
            calc.setup(traj, aperture=20, voltage_eV=100e3, sampling=0.1,
                       slice_thickness=0.5, use_cache=False,
                       device_output=True, probe_positions=pg.tolist())
        msgs = [r.message for r in caplog.records
                if "StreamingTACAW" in r.message]
        assert msgs and "GiB exit-wave array" in msgs[0]

    def test_silent_at_small_shapes(self, caplog, thermal_traj):
        calc = MultisliceCalculator()
        with caplog.at_level("WARNING"):
            calc.setup(thermal_traj, aperture=0, voltage_eV=100e3,
                       sampling=0.1, slice_thickness=0.5,
                       use_cache=False, device_output=True)
        assert not [r for r in caplog.records
                    if "exit-wave array" in r.message]

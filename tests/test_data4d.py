"""Experimental 4D-STEM ingest (io/data4d.py): EMD auto-discovery, crop
and Poisson-preserving binning, chunked reads, and an end-to-end check
that a datacube round-trips into the reconstruction tools."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from pyslice_tpu.io.data4d import load_4dstem, scan_positions


def _write_emd(path, cube, tag=True, extra=False):
    with h5py.File(path, "w") as f:
        g = f.create_group("version_1/data/datacubes/cube0")
        if tag:
            g.attrs["emd_group_type"] = 1
        g.create_dataset("data", data=cube, chunks=(1,) + cube.shape[1:])
        if extra:
            f.create_dataset("unrelated/fourdee",
                             data=np.zeros((2, 2, 4, 4)))


def test_load_emd_discovery_and_layout(tmp_path):
    rng = np.random.default_rng(0)
    cube = rng.poisson(20.0, (3, 4, 8, 6)).astype(np.float64)
    f = tmp_path / "cube.emd"
    _write_emd(f, cube, tag=True, extra=True)
    r = load_4dstem(f, scan_step=0.3)
    assert r["dataset"].endswith("cube0/data")
    assert r["scan_shape"] == (3, 4)
    assert r["data"].shape == (12, 8, 6)
    # row-major flatten: position (i, j) -> index i*n_sy + j
    np.testing.assert_array_equal(r["data"][1 * 4 + 2], cube[1, 2])
    np.testing.assert_allclose(r["positions"][1 * 4 + 2], [0.3, 0.6])
    np.testing.assert_array_equal(
        r["positions"], scan_positions((3, 4), 0.3))


def test_load_crop_and_bin(tmp_path):
    rng = np.random.default_rng(1)
    cube = rng.poisson(5.0, (2, 2, 12, 12)).astype(np.float64)
    f = tmp_path / "cube.h5"
    _write_emd(f, cube, tag=False)          # falls back to first 4-D
    r = load_4dstem(f, crop_k=8, bin_k=2)
    assert r["data"].shape == (4, 4, 4)
    # counts preserved: binning sums
    manual = cube[0, 0, 2:10, 2:10].reshape(4, 2, 4, 2).sum(axis=(1, 3))
    np.testing.assert_array_equal(r["data"][0], manual)

    with pytest.raises(ValueError, match="does not divide"):
        load_4dstem(f, crop_k=9, bin_k=2)
    with pytest.raises(ValueError, match="crop_k"):
        load_4dstem(f, crop_k=20)
    with pytest.raises(ValueError, match="no dataset"):
        load_4dstem(f, dataset="/nope")


def test_no_4d_dataset_raises(tmp_path):
    f = tmp_path / "flat.h5"
    with h5py.File(f, "w") as fh:
        fh.create_dataset("x", data=np.zeros((4, 4)))
    with pytest.raises(ValueError, match="no 4-D dataset"):
        load_4dstem(f)


def test_datacube_feeds_reconstruction(tmp_path):
    """End to end: a simulated scan written as an EMD datacube, read back
    and reconstructed with iCoM — the experimental-data on-ramp."""
    import jax.numpy as jnp

    from pyslice_tpu.analysis.ptychography import icom_reconstruct
    from pyslice_tpu.core.dtypes import get_precision
    from pyslice_tpu.physics.potential import make_plan, rasterize
    from pyslice_tpu.physics.probe import Probe, shift_probes
    from pyslice_tpu.physics.propagate import multislice

    prec = get_precision("single")
    NX = NY = 32
    S, EV, DZ = 0.2, 100e3, 1.0
    lx, ly = NX * S, NY * S
    xs = np.linspace(0, lx, NX, endpoint=False)
    ys = np.linspace(0, ly, NY, endpoint=False)
    zs = np.array([0.0])
    rng = np.random.default_rng(5)
    pos = rng.random((1, 6, 3)) * np.array([lx, ly, DZ - 0.05])
    types = rng.choice([5, 7], 6).astype(np.int32)
    plan = make_plan(xs, ys, zs, pos, types)
    v = rasterize(jnp.asarray(pos[0], prec.real), plan, prec)
    base = Probe(xs, ys, 25.0, EV, precision=prec)
    n_s = 8
    step = lx / n_s
    positions = scan_positions((n_s, n_s), step)
    probes = shift_probes(base.array, base.kxs, base.kys, positions,
                          precision=prec)
    ew = multislice(probes, v, base.kxs, base.kys, eV=EV, dz=DZ,
                    precision=prec, fused=False)
    inten = np.asarray(jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(ew),
                                                axes=(-2, -1)))) ** 2
    cube = inten.reshape(n_s, n_s, NX, NY)

    f = tmp_path / "scan.emd"
    _write_emd(f, cube)
    r = load_4dstem(f, scan_step=step)
    np.testing.assert_array_equal(r["data"], inten)
    np.testing.assert_allclose(r["positions"], positions)

    data4d = r["data"].reshape(n_s, n_s, NX, NY)
    rec = icom_reconstruct(data4d, np.arange(n_s) * step,
                           np.arange(n_s) * step,
                           np.fft.fftshift(base.kxs),
                           np.fft.fftshift(base.kys), probe=base)
    assert np.all(np.isfinite(rec["phase"]))
    assert rec["phase"].std() > 0


def test_center_and_calibrate():
    """Preprocessing helpers: integer re-centering of an offset beam and
    k-sampling calibration from the bright-field disk radius."""
    from pyslice_tpu.core.constants import wavelength
    from pyslice_tpu.io.data4d import center_datacube, k_sampling_from_disk

    nk = 64
    dk_true = 0.02          # 1/A per pixel
    mrad, eV = 20.0, 100e3
    k_ap = (mrad * 1e-3) / wavelength(eV)
    r_pix = k_ap / dk_true
    gx, gy = np.meshgrid(np.arange(nk), np.arange(nk), indexing="ij")
    # disk deliberately off-center by (5, -3)
    disk = (((gx - (nk // 2 + 5)) ** 2 + (gy - (nk // 2 - 3)) ** 2)
            <= r_pix ** 2).astype(np.float64)
    data = np.stack([disk, disk])[None]          # (1, 2, nk, nk)

    centered, (dx, dy) = center_datacube(data, return_shift=True)
    assert (dx, dy) == (-5, 3)
    m = centered[0, 0]
    cx = (m.sum(axis=1) * np.arange(nk)).sum() / m.sum()
    assert abs(cx - nk // 2) < 0.6

    dk = k_sampling_from_disk(centered[0, 0], mrad, eV)
    assert abs(dk - dk_true) / dk_true < 0.05, dk

    with pytest.raises(ValueError, match="empty"):
        center_datacube(np.zeros((1, 4, 4)))
    with pytest.raises(ValueError, match="disk"):
        k_sampling_from_disk(np.ones((8, 8)) * 1e-12, mrad, eV,
                             threshold=2.0)


def test_save_load_roundtrip(tmp_path):
    """save_4dstem writes an EMD 1.0 layout load_4dstem auto-discovers."""
    pytest.importorskip("h5py")
    from pyslice_tpu.io.data4d import load_4dstem, save_4dstem
    rng = np.random.default_rng(0)
    cube = rng.random((3, 4, 8, 8))
    p = tmp_path / "out.emd"
    save_4dstem(p, cube)
    r = load_4dstem(p, scan_step=0.5)
    assert r["scan_shape"] == (3, 4)
    np.testing.assert_allclose(
        r["data"].reshape(3, 4, 8, 8), cube, atol=1e-6)
    assert r["positions"].shape == (12, 2)

    # flattened input + scan_shape
    p2 = tmp_path / "flat.emd"
    save_4dstem(p2, cube.reshape(12, 8, 8), scan_shape=(3, 4))
    r2 = load_4dstem(p2)
    np.testing.assert_allclose(r2["data"], r["data"], atol=1e-6)

    with pytest.raises(ValueError, match="scan_shape"):
        save_4dstem(tmp_path / "x.emd", cube.reshape(12, 8, 8))

"""CLI + SimulationConfig round trips."""

import json

import numpy as np
import pytest

from pyslice_tpu.__main__ import main
from pyslice_tpu.engine.config import SimulationConfig
from pyslice_tpu.io import lammps as lammps_io
from tests.fixtures import hbn_thermal


@pytest.fixture()
def dump(tmp_path):
    traj = hbn_thermal(n_frames=3, sigma=0.05)
    path = tmp_path / "t.lammpstrj"
    generic = np.where(traj.atom_types == 5, 1, 2)
    lammps_io.write_lammps_dump(path, generic, traj.positions,
                                traj.velocities, traj.box_matrix)
    return path


def test_config_roundtrip(tmp_path):
    cfg = SimulationConfig(trajectory="x.lammpstrj", timestep=0.005,
                           atom_mapping={1: "B", 2: 7},
                           probe_grid=(0, 1, 0, 1, 2, 2), mode="haadf")
    p = tmp_path / "c.json"
    cfg.save(p)
    cfg2 = SimulationConfig.load(p)
    assert cfg2 == cfg
    assert cfg2.resolve_probe_positions().shape == (4, 2)


def test_config_unknown_key():
    with pytest.raises(ValueError, match="Unknown config keys"):
        SimulationConfig.from_json(json.dumps({"nonsense": 1}))


def test_cli_tacaw_run(dump, tmp_path):
    out = tmp_path / "out"
    rc = main(["run", "--trajectory", str(dump), "--timestep", "0.005",
               "--atom-mapping", "1=B,2=N", "--sampling", "0.3",
               "--slice-thickness", "0.8", "--precision", "double",
               "--mode", "tacaw", "--output-dir", str(out), "--no-cache"])
    assert rc == 0
    assert (out / "spectrum.npy").exists()
    assert (out / "diffraction.npy").exists()
    assert (out / "config.json").exists()
    spec = np.load(out / "spectrum.npy")
    assert spec.shape == (3,) and np.all(np.isfinite(spec))


def test_cli_haadf_run(dump, tmp_path):
    out = tmp_path / "outh"
    rc = main(["run", "--trajectory", str(dump), "--timestep", "0.005",
               "--atom-mapping", "1=B,2=N", "--sampling", "0.3",
               "--slice-thickness", "0.8", "--aperture", "30",
               "--probe-grid", "1,3,1,3,2,2", "--mode", "haadf",
               "--output-dir", str(out), "--no-cache"])
    assert rc == 0
    img = np.load(out / "haadf_image.npy")
    assert img.shape == (2, 2)


def test_cli_info(dump, capsys):
    rc = main(["info", str(dump), "--no-cache"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "frames:     3" in out


def test_cli_missing_trajectory():
    assert main(["run", "--mode", "tacaw"]) == 2


def test_cli_calibrate(tmp_path, capsys):
    pytest.importorskip("h5py")
    import json

    from pyslice_tpu.io.data4d import save_4dstem

    rng = np.random.default_rng(0)
    nk = 24
    kx = np.arange(nk)[:, None]
    ky = np.arange(nk)[None, :]
    cube = np.empty((6, 6, nk, nk))
    for i in range(6):
        for j in range(6):
            cube[i, j] = 50.0 * np.exp(
                -((kx - nk / 2 - 0.2 * i) ** 2
                  + (ky - nk / 2 + 0.1 * j) ** 2) / (2 * 3.0 ** 2))
    cube += rng.random(cube.shape)
    cube[:, :, 3, 5] = 4000.0                    # hot pixel
    src = tmp_path / "raw.emd"
    save_4dstem(src, cube)

    out = tmp_path / "cal"
    rc = main(["calibrate", str(src), "--scan-step", "0.5",
               "--output-dir", str(out)])
    assert rc == 0
    report = json.loads((out / "report.json").read_text())
    assert report["bad_pixels"] >= 1
    assert report["dose_e_per_A2"] > 0
    com = np.load(out / "com.npy")
    assert com.shape == (2, 6, 6)
    assert (out / "calibrated.emd").exists()
    assert "descan removed" in capsys.readouterr().out

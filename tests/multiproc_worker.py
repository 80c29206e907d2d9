"""Worker for the REAL multi-process tier (``jax.process_count() > 1``).

Launched by tests/test_multiproc.py as N separate OS processes sharing a
localhost coordinator (``jax.distributed.initialize`` via
``parallel.mesh.initialize_multihost``), each with its own set of local CPU
devices and Gloo cross-process collectives. This genuinely creates
NON-ADDRESSABLE shards — the thing every multi-host claim in the codebase
was built around (round-4 shard_map'ed facades; per-addressable-shard
checkpoints) but which single-process virtual meshes can never produce.

What each process proves (against goldens the parent pytest process
computed UNSHARDED, single-process, on the plain engine path):

1. ``make_multihost_mesh`` builds the hybrid ('frame','probe') mesh with
   the frame axis crossing processes (DCN in production, SURVEY §5).
2. ``run_sharded`` produces the unsharded exit waves exactly — verified
   shard-by-addressable-shard (fetching a non-addressable shard would
   raise; none is touched).
3. The sharded TACAW reshard + reductions (all_to_all frame->kx, psum)
   match the unsharded spectrum.
4. The USER-FACING facades — MultisliceCalculator(mesh=...) -> TACAWData
   spectrum/diffraction/masked_spectrum/dispersion/spectrum_image and
   HAADFData.calculateADF — run to completion (they'd raise on any eager
   touch of a non-addressable shard) and match the unsharded goldens.
5. StreamingTACAW (frame-sharded accumulators) matches the unsharded
   batch spectrum at the selected bins.
6. StreamingHAADF per-addressable-shard checkpoint save on ALL processes /
   restore into a fresh stream resumes BIT-IDENTICALLY (max|delta| == 0)
   vs the uninterrupted stream.
7. Sharded multislice ptychography (psum'd adjoint gradients) stays
   finite and is identical across processes.

Each process writes ``result.p<i>.json`` (scalar digests of every
replicated output) so the parent can assert cross-process agreement, and
prints ``ALL-OK`` on success.

Reference context: the reference is single-process single-device
(/root/reference/src/multislice/calculators.py:163-197 — a serial frame
loop); this tier is the "distributed communication backend" row of
SURVEY §5 that the reference lacks.
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build_problem():
    """Deterministic tiny problem shared by parent (goldens) and workers.

    8 frames x 4 probes of hBN, DOUBLE precision (x64 verification mode on
    both sides so parity is asserted at the 1e-9 bar, like
    tests/test_sharding.py) — divisible by the (4, 2) frame x probe mesh
    both process layouts build.
    """
    sys.path.insert(0, str(REPO))
    import numpy as np
    from pyslice_tpu.core.dtypes import DOUBLE
    from pyslice_tpu.core.grids import grid_from_trajectory
    from pyslice_tpu.engine.pipeline import SimSpec
    from pyslice_tpu.physics.potential import make_plan
    from pyslice_tpu.physics.probe import Probe, create_batched_probes

    n_frames, n_probes = 8, 4
    a = 2.504
    by = np.sqrt(3.0) * a
    lz = 6.784
    box = np.array([a, by, lz])
    base_cell = np.array([
        [0.0, 0.0, lz / 4], [a / 2, by / 6, lz / 4],
        [a / 2, by / 2, lz / 4], [0.0, by / 2 + by / 6, lz / 4]])
    types = np.array([5, 7, 5, 7], dtype=np.int32)
    rng = np.random.default_rng(0)
    positions = base_cell[None] + rng.random((n_frames, 4, 3)) * 0.05

    class _Box:
        box_matrix = np.diag(box)

    grid = grid_from_trajectory(_Box(), sampling=0.4, slice_thickness=1.5)
    plan = make_plan(grid.xs, grid.ys, grid.zs, positions, types)
    spec = SimSpec.create(grid, plan, 100e3, precision=DOUBLE)
    base = Probe(grid.xs, grid.ys, 20, 100e3, precision=DOUBLE)
    pg = [(0.5 + 0.4 * i, 0.8) for i in range(n_probes)]
    probes = create_batched_probes(base, pg).array

    rng2 = np.random.default_rng(7)
    traj_kw = dict(
        atom_types=types,
        positions=rng2.random((n_frames, 4, 3)) * box * 0.8 + 0.1,
        velocities=np.zeros((n_frames, 4, 3)),
        box_matrix=np.diag(box),
        timestep=0.005)
    calc_kw = dict(aperture=20, voltage_eV=100e3, sampling=0.4,
                   slice_thickness=1.5,
                   probe_positions=[(0.5 + 0.1 * i, 0.5)
                                    for i in range(n_probes)])
    return spec, positions, probes, traj_kw, calc_kw


def compute_goldens(out_path):
    """Parent-side single-process UNSHARDED references (the engine path the
    x64 oracle suite already certifies). Saved as an .npz the workers load."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from pyslice_tpu.analysis.haadf import HAADFData
    from pyslice_tpu.analysis.tacaw import TACAWData
    from pyslice_tpu.data.trajectory import Trajectory
    from pyslice_tpu.engine.calculator import MultisliceCalculator
    from pyslice_tpu.engine.pipeline import frame_exit_waves
    from pyslice_tpu.engine.streaming import StreamingHAADF, StreamingTACAW
    from pyslice_tpu.physics.probe import probe_grid

    spec, positions, probes, traj_kw, calc_kw = build_problem()
    g = {}

    # run_sharded oracle: plain per-frame exit waves, (p, f, nx, ny, L)
    wf = np.stack([np.asarray(frame_exit_waves(jnp.asarray(p),
                                               jnp.asarray(probes), spec))
                   for p in positions], axis=1)
    g["wf"] = wf

    # sharded-TACAW oracle: mean-subtracted time FFT -> spectrum
    x = wf[..., -1]
    x = x - x.mean(axis=1, keepdims=True)
    fft = np.fft.fftshift(np.fft.fft(x, axis=1), axes=1)
    inten = np.abs(fft) ** 2
    g["spectrum_raw"] = inten.sum(axis=(2, 3)).mean(axis=0)

    # facade oracles (unsharded calculator on the SAME Trajectory)
    calc = MultisliceCalculator(precision="double")
    calc.setup(Trajectory(**traj_kw), use_cache=False, **calc_kw)
    wf_data = calc.run(progress=False)
    tac = TACAWData(wf_data)
    g["facade_spectrum"] = np.asarray(tac.spectrum())
    g["facade_diffraction"] = np.asarray(tac.diffraction())
    nx = len(tac.kxs)
    ny = len(tac.kys)
    mask = (np.add.outer(np.asarray(tac.kxs) ** 2,
                         np.asarray(tac.kys) ** 2) > 1.0).astype(float)
    g["facade_masked"] = np.asarray(tac.masked_spectrum(mask))
    g["facade_dispersion"] = np.asarray(
        tac.dispersion(np.linspace(0, 2, 5), np.zeros(5)))
    g["facade_spectrum_image"] = np.asarray(
        tac.spectrum_image(float(np.abs(tac.frequencies).max() / 2)))
    g["facade_adf"] = np.asarray(
        HAADFData(wf_data).calculateADF(collection_angle=45))

    # streaming TACAW oracle at 2 bins (unsharded stream, same physics)
    st = StreamingTACAW(spec, jnp.asarray(probes), positions.shape[0],
                        timestep=0.005, frequencies=[0.0, 20.0])
    for f in range(positions.shape[0]):
        st.add_frame(f, positions[f])
    g["stream_spectrum"] = np.asarray(st.spectrum())

    # streaming HAADF oracle (uninterrupted, unsharded)
    pg = probe_grid([0.5, 2.0], [0.5, 2.0], 2, 2)[:probes.shape[0]]
    sh = StreamingHAADF(spec, jnp.asarray(probes), pg, collection_angle=45,
                        intensity=True)
    for f in range(positions.shape[0]):
        sh.add_frame(positions[f], frame_index=f)
    g["stream_haadf"] = np.asarray(sh.image())

    np.savez(out_path, **g)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    local_devices = int(sys.argv[3])
    port = sys.argv[4]
    workdir = Path(sys.argv[5])

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, str(REPO))
    from pyslice_tpu.parallel.mesh import (FRAME_AXIS, PROBE_AXIS,
                                           initialize_multihost,
                                           make_multihost_mesh)
    initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                         num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == local_devices
    assert len(jax.devices()) == nproc * local_devices

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    golden = dict(np.load(workdir / "goldens.npz"))
    result = {}

    def check(name, got, want, rtol=1e-9):
        got = np.asarray(got)
        assert got.shape == want.shape, (name, got.shape, want.shape)
        err = float(np.max(np.abs(got - want))
                    / max(float(np.max(np.abs(want))), 1e-300))
        assert err < rtol, (name, err)
        result[name + "_digest"] = float(np.sum(np.abs(got)))
        result[name + "_relerr"] = err

    # --- 1. hybrid mesh: frame axis crosses processes -----------------------
    mesh = make_multihost_mesh(n_probe_shards=2)
    assert dict(mesh.shape) == {FRAME_AXIS: 4, PROBE_AXIS: 2}, mesh.shape
    col_procs = {d.process_index for d in mesh.devices[:, 0]}
    assert len(col_procs) == nproc, (
        f"frame axis must cross all {nproc} processes, got {col_procs}")

    spec, positions, probes, traj_kw, calc_kw = build_problem()
    probes = jnp.asarray(probes)

    # --- 2. run_sharded: shard-exact vs the unsharded oracle ----------------
    from pyslice_tpu.parallel.sharded import (run_sharded,
                                              tacaw_intensity_sharded,
                                              tacaw_spectrum_sharded)
    wf = run_sharded(jnp.asarray(positions), probes, spec, mesh)
    assert not wf.is_fully_addressable, (
        "multi-process run must leave non-addressable shards")
    n_local_shards = 0
    for sh in wf.addressable_shards:
        np.testing.assert_allclose(np.asarray(sh.data),
                                   golden["wf"][sh.index], rtol=1e-9)
        n_local_shards += 1
    assert n_local_shards == local_devices
    result["wf_local_shards"] = n_local_shards

    # --- 3. sharded TACAW reshard + reductions ------------------------------
    inten = tacaw_intensity_sharded(wf, mesh, crop=False)
    spec_sh = tacaw_spectrum_sharded(inten, mesh)
    check("spectrum_raw", jax.device_get(spec_sh), golden["spectrum_raw"])

    # --- 4. user-facing facades on the mesh ---------------------------------
    from pyslice_tpu.analysis.haadf import HAADFData
    from pyslice_tpu.analysis.tacaw import TACAWData
    from pyslice_tpu.data.trajectory import Trajectory
    from pyslice_tpu.engine.calculator import MultisliceCalculator

    calc = MultisliceCalculator(precision="double")
    calc.setup(Trajectory(**traj_kw), mesh=mesh, **calc_kw)
    wf_data = calc.run(progress=False)
    assert not wf_data.wavefunction_data.is_fully_addressable
    tac = TACAWData(wf_data)
    check("facade_spectrum", tac.spectrum(), golden["facade_spectrum"])
    check("facade_diffraction", tac.diffraction(),
          golden["facade_diffraction"])
    kxs = np.asarray(tac.kxs)
    kys = np.asarray(tac.kys)
    mask = (np.add.outer(kxs ** 2, kys ** 2) > 1.0).astype(float)
    check("facade_masked", tac.masked_spectrum(mask),
          golden["facade_masked"])
    check("facade_dispersion",
          tac.dispersion(np.linspace(0, 2, 5), np.zeros(5)),
          golden["facade_dispersion"])
    check("facade_spectrum_image",
          tac.spectrum_image(float(np.abs(tac.frequencies).max() / 2)),
          golden["facade_spectrum_image"])
    check("facade_adf", HAADFData(wf_data).calculateADF(collection_angle=45),
          golden["facade_adf"])

    # --- 5. frame-sharded StreamingTACAW ------------------------------------
    from pyslice_tpu.engine.streaming import StreamingHAADF, StreamingTACAW
    f_extent = mesh.shape[FRAME_AXIS]
    n_frames = positions.shape[0]
    st = StreamingTACAW(spec, probes, n_frames, timestep=0.005,
                        frequencies=[0.0, 20.0], mesh=mesh)
    blocks = [list(range(b * f_extent, (b + 1) * f_extent))
              for b in range(n_frames // f_extent)]
    for idx in blocks:
        st.add_frame_block(idx, positions[np.asarray(idx)])
    check("stream_spectrum", st.spectrum(), golden["stream_spectrum"])

    # --- 6. per-addressable-shard checkpoint kill/resume ---------------------
    from pyslice_tpu.physics.probe import probe_grid
    pg = probe_grid([0.5, 2.0], [0.5, 2.0], 2, 2)[:probes.shape[0]]
    hkw = dict(collection_angle=45, intensity=True, mesh=mesh)
    st_a = StreamingHAADF(spec, probes, pg, **hkw)
    st_b = StreamingHAADF(spec, probes, pg, **hkw)
    for idx in blocks:
        st_a.add_frame_block(positions[np.asarray(idx)], frame_indices=idx)
    st_b.add_frame_block(positions[np.asarray(blocks[0])],
                         frame_indices=blocks[0])
    ckdir = workdir / "ckpt"
    ckdir.mkdir(exist_ok=True)
    st_b.save_checkpoint(ckdir)            # every process: ITS shards only
    multihost_utils.sync_global_devices("ckpt-written")
    st_c = StreamingHAADF(spec, probes, pg, **hkw)     # "restarted job"
    seen = st_c.restore(ckdir)
    assert seen == set(blocks[0]), seen
    for idx in blocks[1:]:
        st_c.add_frame_block(positions[np.asarray(idx)], frame_indices=idx)
    img_a, img_c = st_a.image(), st_c.image()
    dmax = float(np.max(np.abs(img_a - img_c)))
    assert dmax == 0.0, f"ckpt resume not bit-identical: {dmax}"
    check("stream_haadf", img_a, golden["stream_haadf"])
    result["ckpt_resume_max_delta"] = dmax

    # --- 7. sharded ptychography (psum'd adjoint gradients) -----------------
    from pyslice_tpu.analysis.ptychography import msp_reconstruct
    from pyslice_tpu.physics.probe import Probe
    xs_m = np.linspace(0, 4.8, 16, endpoint=False)
    probe_m = Probe(xs_m, xs_m, 20.0, 100e3)
    rng_m = np.random.default_rng(1)
    n_pat = 2 * nproc * local_devices
    pats = rng_m.random((n_pat, 16, 16)).astype(np.float64)
    pos_m = rng_m.random((n_pat, 2)) * 4.0
    rec = msp_reconstruct(pats, pos_m, probe_m, n_slices=2, dz=1.0,
                          steps=2, batch=nproc * local_devices, lr=1.0,
                          mesh=mesh)
    losses = np.asarray(rec["losses"])
    assert np.all(np.isfinite(losses)), losses
    result["msp_losses"] = [float(x) for x in losses]

    (workdir / f"result.p{pid}.json").write_text(json.dumps(result))
    multihost_utils.sync_global_devices("results-written")
    jax.distributed.shutdown()
    print(f"ALL-OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()

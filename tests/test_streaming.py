"""Streaming engines vs the batch path."""

import numpy as np
import pytest

from pyslice_tpu.analysis.haadf import HAADFData
from pyslice_tpu.analysis.tacaw import TACAWData
from pyslice_tpu.core.dtypes import DOUBLE
from pyslice_tpu.core.grids import grid_from_trajectory
from pyslice_tpu.engine.calculator import MultisliceCalculator
from pyslice_tpu.engine.pipeline import SimSpec
from pyslice_tpu.engine.streaming import StreamingHAADF, StreamingTACAW
from pyslice_tpu.physics.potential import make_plan
from pyslice_tpu.physics.probe import Probe, create_batched_probes, probe_grid
from tests.fixtures import hbn_thermal

SAMPLING = 0.25
SLICE_T = 0.8


@pytest.fixture(scope="module")
def setup():
    traj = hbn_thermal(n_frames=6, sigma=0.05, seed=11)
    g = grid_from_trajectory(traj, sampling=SAMPLING, slice_thickness=SLICE_T)
    plan = make_plan(g.xs, g.ys, g.zs, traj.positions, traj.atom_types)
    spec = SimSpec.create(g, plan, 100e3, precision=DOUBLE)
    return traj, g, spec


def test_streaming_tacaw_matches_batch(setup):
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    pp = [(g.lx / 2, g.ly / 2)]
    probes = create_batched_probes(base, pp).array

    # batch path
    calc = MultisliceCalculator(precision=DOUBLE)
    calc.setup(traj, aperture=0, voltage_eV=100e3, sampling=SAMPLING,
               slice_thickness=SLICE_T, use_cache=False)
    tac = TACAWData(calc.run(progress=False))

    # streaming at a few target frequencies (frames fed out of order)
    targets = [float(tac.frequencies[1]), float(tac.frequencies[4]), 0.0]
    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=targets)
    for f in [3, 0, 5, 1, 4, 2]:
        st.add_frame(f, traj.positions[f])

    inten = np.asarray(st.intensity())          # (n_sel, n_probes, nx, ny)
    for i, f_thz in enumerate(targets):
        want = tac.spectral_diffraction(f_thz, probe_index=0)
        got = inten[i, 0]
        assert np.allclose(got, want, rtol=1e-8, atol=1e-12), \
            f"bin {i} ({f_thz} THz) mismatch"

    spec_stream = st.spectrum(probe_index=0)
    for i, f_thz in enumerate(targets):
        idx = int(np.argmin(np.abs(tac.frequencies - f_thz)))
        assert np.isclose(spec_stream[i], tac.spectrum(0)[idx], rtol=1e-8)


def test_streaming_tacaw_incomplete_raises(setup):
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, [(1.0, 1.0)]).array
    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=[0.0])
    st.add_frame(0, traj.positions[0])
    with pytest.raises(ValueError, match="streamed 1 of"):
        st.intensity()


def test_streaming_haadf_matches_batch(setup):
    traj, g, spec = setup
    short = traj.slice_timesteps([0, 1, 2])
    pg = probe_grid([1, 3], [1, 3], 3, 3)
    base = Probe(g.xs, g.ys, 30, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    calc = MultisliceCalculator(precision=DOUBLE)
    calc.setup(short, aperture=30, voltage_eV=100e3, sampling=SAMPLING,
               slice_thickness=SLICE_T, probe_positions=pg, use_cache=False)
    want = HAADFData(calc.run(progress=False)).calculateADF(45)

    st = StreamingHAADF(spec, probes, pg, collection_angle=45)
    for f in range(short.n_frames):
        st.add_frame(short.positions[f])
    got = st.image()
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_streaming_probe_chunks_and_no_zero_bin(setup):
    """Chunked accumulation + dropped mean tracker match the batch path."""
    traj, g, spec = setup
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    calc = MultisliceCalculator(precision=DOUBLE)
    calc.setup(traj, aperture=0, voltage_eV=100e3, sampling=SAMPLING,
               slice_thickness=SLICE_T, probe_positions=pg, use_cache=False)
    tac = TACAWData(calc.run(progress=False))

    targets = [float(tac.frequencies[1]), float(tac.frequencies[4])]  # no 0
    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=targets, probe_chunk=3)
    assert not st._track_mean
    for f in range(traj.n_frames):
        st.add_frame(f, traj.positions[f])
    inten = np.asarray(st.intensity())
    assert inten.shape[1] == 4
    for i, f_thz in enumerate(targets):
        for p in range(4):
            want = tac.spectral_diffraction(f_thz, probe_index=p)
            assert np.allclose(inten[i, p], want, rtol=1e-8, atol=1e-12)


def test_streaming_checkpoint_resume(setup, tmp_path):
    """Kill-and-resume (single device, probe chunks): bit-identical."""
    traj, g, spec = setup
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    def new_stream():
        return StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                              frequencies=[20.0, 0.0], probe_chunk=3)

    st0 = new_stream()
    for f in range(traj.n_frames):
        st0.add_frame(f, traj.positions[f])
    want = np.asarray(st0.intensity())

    # crash after a prefix -> resume preserves accumulation order exactly
    st1 = new_stream()
    for f in (0, 1, 2):
        st1.add_frame(f, traj.positions[f])
    st1.save_checkpoint(tmp_path / "c")
    st2 = new_stream()
    seen = st2.restore(tmp_path / "c")
    assert seen == {0, 1, 2}
    for f in range(traj.n_frames):
        if f not in seen:
            st2.add_frame(f, traj.positions[f])
    np.testing.assert_array_equal(np.asarray(st2.intensity()), want)

    # out-of-order resume is numerically equivalent (fp reordering only)
    st3 = new_stream()
    for f in (5, 2, 0):
        st3.add_frame(f, traj.positions[f])
    st3.save_checkpoint(tmp_path / "c2")
    st4 = new_stream()
    seen = st4.restore(tmp_path / "c2")
    for f in (4, 1, 3):
        st4.add_frame(f, traj.positions[f])
    np.testing.assert_allclose(np.asarray(st4.intensity()), want,
                               rtol=1e-12, atol=1e-14)


def test_streaming_legacy_checkpoint_layout_restores(setup, tmp_path):
    """A round-2 checkpoint (manifest.json + single-file <name>.npy, no
    per-process/per-shard naming) must still restore: the key deliberately
    excludes process identity, and the legacy file fallbacks are live."""
    import json
    import re

    traj, g, spec = setup
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    def new_stream():
        return StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                              frequencies=[20.0, 0.0], probe_chunk=3)

    st1 = new_stream()
    for f in (0, 1, 2):
        st1.add_frame(f, traj.positions[f])
    d = tmp_path / "legacy"
    st1.save_checkpoint(d)

    # Convert to the round-2 layout: single-host, single-shard files.
    (d / "manifest.p0.json").rename(d / "manifest.json")
    for p in sorted(d.glob("*.s*.npy")):
        p.rename(d / re.sub(r"\.s[0-9_]+\.npy$", ".npy", p.name))
    assert not list(d.glob("manifest.p*.json"))

    st2 = new_stream()
    seen = st2.restore(d)
    assert seen == {0, 1, 2}
    for f in range(traj.n_frames):
        if f not in seen:
            st2.add_frame(f, traj.positions[f])

    st0 = new_stream()
    for f in range(traj.n_frames):
        st0.add_frame(f, traj.positions[f])
    np.testing.assert_array_equal(np.asarray(st2.intensity()),
                                  np.asarray(st0.intensity()))


def test_streaming_duplicate_frame_rejected(setup):
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, [(1.0, 1.0)]).array
    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=[20.0])
    st.add_frame(0, traj.positions[0])
    with pytest.raises(ValueError, match="already streamed"):
        st.add_frame(0, traj.positions[0])


def _shim_to_numpy_bound(monkeypatch, max_elems):
    """Fail any host gather larger than one shard (the multi-host-safety
    contract: checkpoints must never materialize a global array)."""
    from pyslice_tpu.utils import host as host_mod
    real = host_mod.to_numpy
    calls = []

    def bounded(x):
        import jax
        if isinstance(x, jax.Array):
            assert x.size <= max_elems, (
                f"global gather of {x.size} elements (> shard bound "
                f"{max_elems}) during checkpoint")
        calls.append(getattr(x, "size", 0))
        return real(x)

    monkeypatch.setattr(host_mod, "to_numpy", bounded)
    return calls


def test_sharded_checkpoint_no_global_gather(monkeypatch, tmp_path):
    """Frame+probe-sharded TACAW stream: kill-resume is bit-identical AND
    the save path touches only per-shard arrays (round-2 weak #4 /
    next-round item 3)."""
    from pyslice_tpu.parallel.mesh import make_mesh
    traj = hbn_thermal(n_frames=8, sigma=0.05, seed=3)
    g = grid_from_trajectory(traj, sampling=SAMPLING, slice_thickness=SLICE_T)
    plan = make_plan(g.xs, g.ys, g.zs, traj.positions, traj.atom_types)
    spec = SimSpec.create(g, plan, 100e3, precision=DOUBLE)
    mesh = make_mesh(4, 2)
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, [(1.0, 1.0), (2.0, 2.0)]).array

    def new_stream():
        return StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                              frequencies=[20.0, 0.0], mesh=mesh)

    blocks = [list(range(i, i + 4)) for i in range(0, 8, 4)]

    st0 = new_stream()
    for b in blocks:
        st0.add_frame_block(b, traj.positions[np.asarray(b)])
    want = np.asarray(st0.intensity())

    st1 = new_stream()
    st1.add_frame_block(blocks[0], traj.positions[np.asarray(blocks[0])])
    n_dev = 8
    shard_bound = max(a.size for a in st1._shard_arrays().values()) // 4
    _shim_to_numpy_bound(monkeypatch, shard_bound)
    st1.save_checkpoint(tmp_path / "cs")
    # per-shard files on disk, no monolithic array file
    import os
    names = os.listdir(tmp_path / "cs")
    assert not any(n == "acc_f.npy" for n in names)
    assert sum(n.startswith("acc_f.s") for n in names) == n_dev

    st2 = new_stream()
    seen = st2.restore(tmp_path / "cs")
    assert seen == set(blocks[0])
    st2.add_frame_block(blocks[1], traj.positions[np.asarray(blocks[1])])
    np.testing.assert_array_equal(np.asarray(st2.intensity()), want)


def test_streaming_haadf_checkpoint_resume(setup, tmp_path):
    """StreamingHAADF kill-resume (round-2 missing #3): bit-identical."""
    traj, g, spec = setup
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    base = Probe(g.xs, g.ys, 30, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    def new_stream():
        return StreamingHAADF(spec, probes, pg, collection_angle=45)

    st0 = new_stream()
    for f in range(traj.n_frames):
        st0.add_frame(traj.positions[f], frame_index=f)
    want = st0.image()

    st1 = new_stream()
    for f in (0, 1, 2):
        st1.add_frame(traj.positions[f], frame_index=f)
    st1.save_checkpoint(tmp_path / "h")
    st2 = new_stream()
    seen = st2.restore(tmp_path / "h")
    assert seen == {0, 1, 2} and st2.n_streamed == 3
    for f in range(traj.n_frames):
        if f not in seen:
            st2.add_frame(traj.positions[f], frame_index=f)
    np.testing.assert_array_equal(st2.image(), want)

    # config mismatch is rejected loudly
    st3 = StreamingHAADF(spec, probes, pg, collection_angle=60)
    with pytest.raises(ValueError, match="mismatch"):
        st3.restore(tmp_path / "h")


def test_streaming_haadf_sharded_checkpoint(monkeypatch, tmp_path):
    """Frame-sharded HAADF stream checkpoint: per-shard files, no global
    gather, resume by count."""
    from pyslice_tpu.parallel.mesh import make_mesh
    traj = hbn_thermal(n_frames=8, sigma=0.05, seed=4)
    g = grid_from_trajectory(traj, sampling=SAMPLING, slice_thickness=SLICE_T)
    plan = make_plan(g.xs, g.ys, g.zs, traj.positions, traj.atom_types)
    spec = SimSpec.create(g, plan, 100e3, precision=DOUBLE)
    mesh = make_mesh(4, 2)
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    base = Probe(g.xs, g.ys, 30, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    def new_stream():
        return StreamingHAADF(spec, probes, pg, collection_angle=45,
                              mesh=mesh)

    st0 = new_stream()
    for i in range(0, 8, 4):
        st0.add_frame_block(traj.positions[i:i + 4],
                            frame_indices=range(i, i + 4))
    want = st0.image()

    st1 = new_stream()
    st1.add_frame_block(traj.positions[0:4], frame_indices=range(4))
    # largest legitimate host transfer: one probes shard (the key digest
    # hashes addressable shards); anything >= a full array is a gather
    _shim_to_numpy_bound(monkeypatch, st1.probes.size // 2)
    st1.save_checkpoint(tmp_path / "hs")
    st2 = new_stream()
    assert st2.restore(tmp_path / "hs") == {0, 1, 2, 3}
    st2.add_frame_block(traj.positions[4:8], frame_indices=range(4, 8))
    np.testing.assert_array_equal(st2.image(), want)


def test_duplicate_haadf_frame_index_rejected(setup):
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 30, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, [(1.0, 1.0)]).array
    st = StreamingHAADF(spec, probes, [(1.0, 1.0)])
    st.add_frame(traj.positions[0], frame_index=0)
    with pytest.raises(ValueError, match="more than once"):
        st.add_frame(traj.positions[1], frame_index=0)


def test_streaming_haadf_probe_chunking(setup):
    """probe_chunk bounds the direct path's working set without changing
    results (the HBM guard for >1k-probe production scans)."""
    traj, g, spec = setup
    pg = probe_grid([1, 3], [1, 3], 3, 3)
    base = Probe(g.xs, g.ys, 30, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, pg).array

    imgs = {}
    for chunk in (None, 4):
        st = StreamingHAADF(spec, probes, pg, collection_angle=45,
                            probe_chunk=chunk)
        for f in range(2):
            st.add_frame(traj.positions[f])
        imgs[chunk] = st.image()
    np.testing.assert_allclose(imgs[4], imgs[None], rtol=1e-12)


def test_streaming_tacaw_block_feed_matches_per_frame(setup):
    """Single-device add_frame_block (any block size — ONE scan dispatch
    per block, the relay-latency amortization) must match per-frame
    feeding bit-exactly, including a ragged final block and the f=0
    mean-subtraction path."""
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, [(g.lx / 2, g.ly / 2)]).array
    targets = [0.0, 7.5]

    def feed(block):
        st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                            frequencies=targets)
        if block is None:
            for f in range(traj.n_frames):
                st.add_frame(f, traj.positions[f])
        else:
            for i0 in range(0, traj.n_frames, block):
                idx = list(range(i0, min(i0 + block, traj.n_frames)))
                st.add_frame_block(idx, traj.positions[np.asarray(idx)])
        return np.asarray(st.intensity())

    ref = feed(None)
    np.testing.assert_array_equal(feed(4), ref)   # blocks of 4 + ragged 2
    np.testing.assert_array_equal(feed(6), ref)   # one block

    # duplicate detection still works through the block path
    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=targets)
    st.add_frame_block([0, 1, 2], traj.positions[:3])
    with pytest.raises(ValueError, match="more than once"):
        st.add_frame_block([2, 3], traj.positions[2:4])


def test_streaming_haadf_block_feed_matches_per_frame(setup):
    """Single-device StreamingHAADF.add_frame_block (any size, one scan
    dispatch) equals per-frame feeding bit-exactly, ragged block included."""
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 25, 100e3, precision=DOUBLE)
    pg = probe_grid([1.0, g.lx - 1.0], [1.0, g.ly - 1.0], 2, 2)
    probes = create_batched_probes(base, pg).array

    def feed(block):
        st = StreamingHAADF(spec, probes, pg, collection_angle=45,
                            eV=100e3)
        if block is None:
            for f in range(traj.n_frames):
                st.add_frame(traj.positions[f], f)
        else:
            for i0 in range(0, traj.n_frames, block):
                idx = list(range(i0, min(i0 + block, traj.n_frames)))
                st.add_frame_block(traj.positions[np.asarray(idx)], idx)
        return np.asarray(st.image())

    ref = feed(None)
    np.testing.assert_array_equal(feed(4), ref)
    np.testing.assert_array_equal(feed(6), ref)


def test_streaming_block_feed_with_probe_chunks(setup):
    """Blocks x probe chunks: the fused multi-chunk programs (one dispatch
    per block folding EVERY chunk) must match the batch analysis exactly —
    TACAW (ragged 3+1 chunk split, mean tracked) and HAADF (9 probes
    zero-padded to 3 chunks of 4)."""
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    probes = create_batched_probes(base, pg).array

    calc = MultisliceCalculator(precision=DOUBLE)
    calc.setup(traj, aperture=0, voltage_eV=100e3, sampling=SAMPLING,
               slice_thickness=SLICE_T, probe_positions=pg, use_cache=False)
    tac = TACAWData(calc.run(progress=False))

    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=[20.0, 0.0], probe_chunk=3)
    for i0 in range(0, traj.n_frames, 4):
        idx = list(range(i0, min(i0 + 4, traj.n_frames)))
        st.add_frame_block(idx, traj.positions[np.asarray(idx)])
    inten = np.asarray(st.intensity())
    for i, f_thz in enumerate([20.0, 0.0]):
        for p in range(4):
            want = tac.spectral_diffraction(f_thz, probe_index=p)
            assert np.allclose(inten[i, p], want, rtol=1e-8, atol=1e-12)

    base_c = Probe(g.xs, g.ys, 30, 100e3, precision=DOUBLE)
    pg9 = probe_grid([1, 3], [1, 3], 3, 3)
    probes9 = create_batched_probes(base_c, pg9).array

    def feed_haadf(chunk, block):
        st = StreamingHAADF(spec, probes9, pg9, collection_angle=45,
                            probe_chunk=chunk)
        if block is None:
            for f in range(traj.n_frames):
                st.add_frame(traj.positions[f], f)
        else:
            for i0 in range(0, traj.n_frames, block):
                idx = list(range(i0, min(i0 + block, traj.n_frames)))
                st.add_frame_block(traj.positions[np.asarray(idx)], idx)
        return np.asarray(st.image())

    ref = feed_haadf(None, None)
    np.testing.assert_allclose(feed_haadf(4, 4), ref, rtol=1e-12)


def test_fused_chunk_gate_memory_aware(setup, monkeypatch):
    """The fused multi-chunk dispatch folds chunks in groups of K sized
    to the device: through a device relay every complex64 boundary buffer
    is materialized twice (measured 20.75 GiB demand for config 5's 6 GiB
    of accumulators + 2 GiB probes on a 15.75 GiB v5e), so K shrinks until
    the group's footprint fits — down to the per-chunk loop (K=1). All
    group sizes are bit-identical; PYSLICE_FUSED_CHUNKS overrides."""
    import pyslice_tpu.engine.streaming as S
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    pg = probe_grid([1, 3], [1, 3], 2, 2)
    probes = create_batched_probes(base, pg).array

    def make(chunk=2):
        return StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                              frequencies=[20.0], probe_chunk=chunk)

    monkeypatch.delenv("PYSLICE_FUSED_CHUNKS", raising=False)
    monkeypatch.setattr(S, "_device_bytes_limit", lambda: None)
    st = make()
    assert st._fuse_group == 2, "unbounded device memory -> full fusion"
    acc_b = max(int(a.nbytes) for a in st._acc_chunks)
    persistent = (sum(int(a.nbytes) for a in st._acc_chunks)
                  + int(st.probes.nbytes))

    # a limit that only admits the per-chunk floor
    monkeypatch.setattr(S, "_device_bytes_limit", lambda: persistent)
    assert make()._fuse_group == 1, "tight limit must fall back to K=1"
    monkeypatch.setattr(S, "_device_bytes_limit",
                        lambda: 100 * (persistent + acc_b))
    assert make()._fuse_group == 2

    # intermediate limit: 4 chunks of 1 probe admit a strict-subset group
    monkeypatch.setattr(S, "_device_bytes_limit", lambda: None)
    st4 = make(chunk=1)
    acc1 = max(int(a.nbytes) for a in st4._acc_chunks)
    per4 = (sum(int(a.nbytes) for a in st4._acc_chunks)
            + int(st4.probes.nbytes))
    # peak(K) = per4 + K*acc1 + 2*K*probes/4 + 2*acc1 <= 0.8*limit
    pb = int(st4.probes.nbytes) / 4
    lim = int((per4 + 2 * acc1 + 2 * (acc1 + 2 * pb)) / 0.8) + 1
    monkeypatch.setattr(S, "_device_bytes_limit", lambda: lim)
    k = make(chunk=1)._fuse_group
    assert 1 < k < 4, f"intermediate limit must pick a subset group, got {k}"

    monkeypatch.setattr(S, "_device_bytes_limit", lambda: persistent)
    monkeypatch.setenv("PYSLICE_FUSED_CHUNKS", "1")
    assert make()._fuse_group == 2, "env=1 forces full fusion"
    monkeypatch.setenv("PYSLICE_FUSED_CHUNKS", "0")
    monkeypatch.setattr(S, "_device_bytes_limit", lambda: None)
    assert make()._fuse_group == 1, "env=0 forces per-chunk"
    monkeypatch.setenv("PYSLICE_FUSED_CHUNKS", "3")
    assert make(chunk=1)._fuse_group == 3, "env=N forces group size N"

    # Every dispatch shape is load-bearing somewhere (full fusion on
    # roomy devices, grouped/per-chunk on memory-tight ones): pin that
    # K=full, K=3 (ragged groups over 4 chunks), and K=1 produce
    # bit-identical intensity through the block-scan feed.
    def run(force, chunk):
        monkeypatch.setenv("PYSLICE_FUSED_CHUNKS", force)
        st = make(chunk=chunk)
        for i0 in range(0, traj.n_frames, 3):
            idx = list(range(i0, min(i0 + 3, traj.n_frames)))
            st.add_frame_block(idx, traj.positions[np.asarray(idx)])
        return np.asarray(st.intensity())

    full = run("1", 1)
    np.testing.assert_array_equal(full, run("3", 1))
    np.testing.assert_array_equal(full, run("0", 1))


def test_streaming_haadf_block_duplicate_is_atomic(setup):
    """A duplicate index anywhere in a block must reject the WHOLE block
    before any state mutates — a per-frame loop would mark earlier block
    indices as seen without accumulating them (resume would then drop
    their contribution permanently)."""
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 25, 100e3, precision=DOUBLE)
    pg = probe_grid([1.0, g.lx - 1.0], [1.0, g.ly - 1.0], 2, 2)
    probes = create_batched_probes(base, pg).array
    st = StreamingHAADF(spec, probes, pg, collection_angle=45, eV=100e3)
    st.add_frame_block(traj.positions[:3], [0, 1, 2])
    with pytest.raises(ValueError, match="more than once"):
        st.add_frame_block(traj.positions[2:5], [4, 5, 2])
    # 4 and 5 were NOT poisoned: the block can be re-fed cleanly
    st.add_frame_block(traj.positions[3:6], [3, 4, 5])
    assert np.all(np.isfinite(np.asarray(st.image())))
    # mismatched frame_indices length rejected up front on every path
    with pytest.raises(ValueError, match="entries"):
        st.add_frame_block(traj.positions[:3], [7, 8])


def test_streaming_tail_block_reuses_program_shape(setup, monkeypatch):
    """A ragged trailing block must be padded to the established block
    size (weights zero the pad frames) so the whole stream runs ONE scan
    program shape — a fresh block-size compile costs tens of seconds
    through the relay."""
    import pyslice_tpu.engine.streaming as sm
    traj, g, spec = setup
    base = Probe(g.xs, g.ys, 0, 100e3, precision=DOUBLE)
    probes = create_batched_probes(base, [(g.lx / 2, g.ly / 2)]).array
    shapes = []
    real_nm = sm._tacaw_accumulate_scan_nomean
    real_m = sm._tacaw_accumulate_scan

    def spy_nm(acc, pos, pr, ph, w, spec, li):
        shapes.append(tuple(pos.shape))
        return real_nm(acc, pos, pr, ph, w, spec, li)

    def spy_m(acc, mean, pos, pr, ph, w, spec, li):
        shapes.append(tuple(pos.shape))
        return real_m(acc, mean, pos, pr, ph, w, spec, li)

    monkeypatch.setattr(sm, "_tacaw_accumulate_scan_nomean", spy_nm)
    monkeypatch.setattr(sm, "_tacaw_accumulate_scan", spy_m)
    st = StreamingTACAW(spec, probes, traj.n_frames, traj.timestep,
                        frequencies=[7.5])
    for i0 in range(0, traj.n_frames, 4):
        idx = list(range(i0, min(i0 + 4, traj.n_frames)))
        st.add_frame_block(idx, traj.positions[np.asarray(idx)])
    assert len(set(shapes)) == 1 and shapes[0][0] == 4

"""REAL multi-process validation tier (``jax.process_count() > 1``).

Round-5 verdict item 1: every multi-host claim — the hybrid DCN mesh, the
shard_map'ed analysis facades rebuilt in round 4 for non-addressable-shard
safety, and the per-addressable-shard streaming checkpoints — had only ever
run on single-process virtual meshes, where every shard is addressable and
nothing can catch an eager global-array touch.

These tests launch 2 (and 4) genuine OS processes with a localhost
coordinator and Gloo CPU collectives (tests/multiproc_worker.py). Each
process holds only its local CPU devices; arrays sharded over the hybrid
mesh are NOT fully addressable, so any facade that gathered a global array
eagerly would raise inside the worker. The workers assert parity against
goldens this (single, separate) pytest process computes on the plain
unsharded engine path — the path the x64 oracle suite certifies.

Reference context: the reference is single-process single-device
(/root/reference/src/multislice/calculators.py:163-197). This tier is the
"distributed communication backend" row of SURVEY §5.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).resolve().parent / "multiproc_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # The parent tier's knobs must not leak into the workers.
    for k in ("PYSLICE_TPU_TESTS", "PYSLICE_EXAMPLES", "XLA_FLAGS"):
        env.pop(k, None)
    return env


@pytest.fixture(scope="session")
def goldens_dir(tmp_path_factory):
    """Single-process unsharded reference outputs, shared by both layouts."""
    from tests.multiproc_worker import compute_goldens
    d = tmp_path_factory.mktemp("multiproc_goldens")
    compute_goldens(d / "goldens.npz")
    return d


@pytest.mark.multiproc
@pytest.mark.slow
@pytest.mark.parametrize(
    "nproc,local_devices",
    [(2, 4), (4, 2)],
    ids=["2proc_x_4dev", "4proc_x_2dev"])
def test_multiprocess_parity(tmp_path, goldens_dir, nproc, local_devices):
    import shutil
    shutil.copy(goldens_dir / "goldens.npz", tmp_path / "goldens.npz")
    port = _free_port()
    procs = []
    logs = []
    for pid in range(nproc):
        log = open(tmp_path / f"worker.p{pid}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc),
             str(local_devices), str(port), str(tmp_path)],
            stdout=log, stderr=subprocess.STDOUT, env=_worker_env(),
            cwd=str(WORKER.parent.parent)))
    try:
        for p in procs:
            assert p.wait(timeout=900) is not None
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    for pid, p in enumerate(procs):
        out = (tmp_path / f"worker.p{pid}.log").read_text()
        assert p.returncode == 0, \
            f"worker {pid} failed (rc={p.returncode}):\n{out[-4000:]}"
        assert f"ALL-OK pid={pid}" in out, out[-4000:]

    # Replicated outputs must agree across processes bit-for-bit: every
    # process fetched them from ITS addressable replica.
    results = [json.loads((tmp_path / f"result.p{i}.json").read_text())
               for i in range(nproc)]
    for i in range(1, nproc):
        assert results[i].keys() == results[0].keys()
        for k, v in results[0].items():
            assert np.array_equal(np.asarray(v),
                                  np.asarray(results[i][k])), \
                (k, v, results[i][k])
    # The worker asserted shard-level parity internally; spot-check the
    # recorded residuals made it through at the expected precision.
    for k, v in results[0].items():
        if k.endswith("_relerr"):
            assert v < 1e-9, (k, v)
    assert results[0]["ckpt_resume_max_delta"] == 0.0


@pytest.mark.multiproc
def test_streaming_mesh_rejects_probe_chunk():
    """probe_chunk and mesh are mutually exclusive by contract, so the
    fused multi-chunk dispatch (engine/streaming.py) can never engage on a
    mesh-sharded stream — pinning the advisor's round-4 concern closed."""
    import jax
    import jax.numpy as jnp
    from pyslice_tpu.engine.streaming import StreamingTACAW
    from pyslice_tpu.parallel.mesh import make_mesh
    from tests.multiproc_worker import build_problem

    spec, positions, probes, _, _ = build_problem()
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    with pytest.raises(ValueError, match="mutually exclusive"):
        StreamingTACAW(spec, jnp.asarray(probes), positions.shape[0],
                       timestep=0.005, frequencies=[0.0], mesh=mesh,
                       probe_chunk=2)
    # and with a mesh the stream always runs as ONE probe chunk
    st = StreamingTACAW(spec, jnp.asarray(probes), positions.shape[0],
                        timestep=0.005, frequencies=[0.0], mesh=mesh)
    assert st.probe_chunk == probes.shape[0]

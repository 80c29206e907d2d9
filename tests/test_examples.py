"""Examples smoke tier — every demo script runs end-to-end at toy sizes.

The reference's demos (`main.py`, `example.ipynb`) are never executed by
anything and the HAADF half of its `main.py` crashes as written
(/root/reference/main.py:218 calls the nonexistent `.ADF`) — exactly the
rot this tier prevents. Each example runs in a subprocess on the CPU
platform (forced via jax.config — the JAX_PLATFORMS env var is ignored in
this environment) with scaled-down arguments.

Run with:  PYSLICE_EXAMPLES=1 python -m pytest tests/test_examples.py -q
(or `-m examples`). Excluded from the default CPU suite to keep it fast.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES_DIR = Path(__file__).resolve().parent.parent / "examples"

# (script, argv, expected stdout fragments)
CASES = [
    ("tacaw_demo.py",
     ["--frames", "8", "--sampling", "0.3"],
     ["spectrum"]),
    ("walkthrough.py", [], []),
    ("make_notebook.py", [], ["cells"]),
    ("make_fixture.py", ["--frames", "4", "--cells", "2", "2"], []),
    ("diffraction_toolkit.py",
     ["--configs", "2", "--azimuths", "2"],
     ["PED", "radial profile"]),
    ("calibration_demo.py", ["--steps-scale", "0.02"],
     ["aberrations", "tilt series"]),
    ("experimental_calibration.py", ["--scan", "12"],
     ["calibration report", "solved"]),
    ("inverse_potential.py",
     ["--nx", "32", "--nz", "2", "--steps", "15"],
     []),
    ("ptychography_demo.py",
     ["--scan", "8", "--iters", "2", "--msp-steps", "5"],
     []),
    ("realistic_stem.py", ["--scan", "2", "--device", "cpu"],
     []),
    ("si_dumbbells.py", ["--scan", "3", "--frames", "1"],
     ["dumbbell split 1.358", "si_dumbbells OK"]),
]


def _run_example(script: str, argv, tmp_path, timeout=900):
    path = EXAMPLES_DIR / script
    assert path.exists(), f"example vanished: {path}"
    # Force the CPU platform before the script (or sitecustomize's jax
    # import) dispatches any compute; run from a temp cwd so output
    # artifacts (PNGs, result dirs) don't land in the repo.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys, runpy; sys.argv = [{str(path)!r}] + {argv!r}\n"
        f"runpy.run_path({str(path)!r}, run_name='__main__')\n"
    )
    env = dict(os.environ, MPLBACKEND="Agg", PYSLICE_EXAMPLES_SMOKE="1")
    return subprocess.run([sys.executable, "-c", code], cwd=tmp_path,
                          capture_output=True, text=True, timeout=timeout,
                          env=env)


@pytest.mark.examples
@pytest.mark.parametrize("script,argv,expect",
                         CASES, ids=[c[0] for c in CASES])
def test_example_runs(script, argv, expect, tmp_path):
    r = _run_example(script, argv, tmp_path)
    assert r.returncode == 0, (
        f"{script} failed\n--- stdout ---\n{r.stdout[-3000:]}\n"
        f"--- stderr ---\n{r.stderr[-3000:]}")
    for frag in expect:
        assert frag in r.stdout, (
            f"{script}: expected {frag!r} in output\n{r.stdout[-3000:]}")


@pytest.mark.examples
def test_notebook_in_sync(tmp_path):
    """walkthrough.ipynb is generated — assert it matches the .py source."""
    sys.path.insert(0, str(EXAMPLES_DIR))
    try:
        from make_notebook import py_to_ipynb
    finally:
        sys.path.pop(0)
    want = py_to_ipynb((EXAMPLES_DIR / "walkthrough.py").read_text())
    have = json.loads((EXAMPLES_DIR / "walkthrough.ipynb").read_text())
    assert [c["source"] for c in want["cells"]] == \
        [c["source"] for c in have["cells"]], \
        "walkthrough.ipynb is stale — run python examples/make_notebook.py"

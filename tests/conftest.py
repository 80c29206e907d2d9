"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the multi-chip story the reference
lacks — SURVEY §4) and with x64 enabled so the float64/complex128
verification mode can be exercised against the NumPy oracle.

Note: JAX_PLATFORMS=cpu via env is ineffective here (the environment's
sitecustomize imports jax first); jax.config.update is the reliable path.
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import pytest

# PYSLICE_TPU_TESTS=1 keeps the real backend for the on-hardware tier:
#   PYSLICE_TPU_TESTS=1 python -m pytest tests/ -m tpu
# (x64 is unavailable on TPU, so the double-precision oracle suite only
# runs in the default CPU mode.)
TPU_MODE = os.environ.get("PYSLICE_TPU_TESTS") == "1"

if not TPU_MODE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_enable_x64", True)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: needs real TPU hardware "
        "(run with PYSLICE_TPU_TESTS=1 python -m pytest -m tpu)")
    config.addinivalue_line(
        "markers", "examples: demo-script smoke runs (subprocesses, ~min "
        "each; run with -m examples or PYSLICE_EXAMPLES=1)")
    config.addinivalue_line(
        "markers", "slow: > ~8 s on the CPU tier (the ~20 heaviest tests "
        "are about half the suite wall-clock; -m 'not slow' is the "
        "~5-minute developer loop, CI always runs everything)")
    config.addinivalue_line(
        "markers", "multiproc: real jax.process_count()>1 runs (launches "
        "2-4 worker OS processes with a localhost coordinator and Gloo "
        "CPU collectives; part of the default CPU tier, also selectable "
        "with -m multiproc)")


def pytest_collection_modifyitems(config, items):
    # The examples tier runs only when asked for: `-m examples` (any mark
    # expression naming it) or PYSLICE_EXAMPLES=1.
    examples_on = (os.environ.get("PYSLICE_EXAMPLES") == "1"
                   or "examples" in (config.option.markexpr or ""))
    for item in items:
        if "examples" in item.keywords:
            if not examples_on:
                item.add_marker(pytest.mark.skip(
                    reason="examples tier: run with -m examples or "
                    "PYSLICE_EXAMPLES=1"))
            continue   # subprocess tests run in either platform mode
        if TPU_MODE:
            # On hardware, run ONLY the tpu tier (the CPU suite needs x64).
            if "tpu" not in item.keywords:
                item.add_marker(pytest.mark.skip(
                    reason="CPU-tier test (x64) skipped in TPU mode"))
        else:
            if "tpu" in item.keywords:
                item.add_marker(pytest.mark.skip(
                    reason="needs PYSLICE_TPU_TESTS=1 and TPU hardware"))

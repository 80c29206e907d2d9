"""Tracing / profiling utilities.

The reference's only observability is wall-clock prints and tqdm bars
(SURVEY §5). Here:

* ``phase(name)`` — nestable wall-clock span timer accumulating into a
  process-global report (``report()`` / ``reset()``).
* ``trace(dir)`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable device trace.
* ``device_timer`` — relay-safe kernel timing: executes a jitted thunk whose
  result collapses to a scalar readback (on some TPU runtimes
  ``block_until_ready`` does not synchronize; a readback always does).
* ``slice_step_rate`` — the headline metric helper: probe-frame
  slice-steps/sec/chip for a measured propagation time.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Dict

_SPANS: Dict[str, float] = collections.defaultdict(float)
_COUNTS: Dict[str, int] = collections.defaultdict(int)


@contextlib.contextmanager
def phase(name: str):
    """Accumulating wall-clock span."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _SPANS[name] += time.perf_counter() - t0
        _COUNTS[name] += 1


def report() -> Dict[str, dict]:
    return {k: {"total_s": round(v, 4), "count": _COUNTS[k],
                "mean_s": round(v / max(_COUNTS[k], 1), 4)}
            for k, v in sorted(_SPANS.items())}


def reset() -> None:
    _SPANS.clear()
    _COUNTS.clear()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pyslice_trace"):
    """jax.profiler device trace (view with TensorBoard's profile plugin)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_timer(thunk, iters: int = 3, warmup: int = 1) -> float:
    """Seconds per call of ``thunk`` (must return a scalar-reducible array);
    synchronizes via scalar readback (relay-safe)."""
    for _ in range(max(warmup, 1)):
        float(thunk())
    t0 = time.perf_counter()
    for _ in range(iters):
        float(thunk())
    return (time.perf_counter() - t0) / iters


def slice_step_rate(seconds_per_frame: float, n_probes: int, nz: int) -> float:
    """Probe-frame slice-steps/sec/chip (the BASELINE.json metric)."""
    return n_probes * nz / seconds_per_frame

"""Precision policy.

The framework runs everything in a single explicit dtype pair (real, complex)
instead of the reference's five per-module backend/dtype shims
(/root/reference/src/multislice/potentials.py:6-44 and siblings).

Two modes:

* ``single`` — float32 / complex64. The TPU-native default: TPU FFT and
  VPU/MXU paths are single precision. The reference itself runs
  complex64 on Apple MPS, and its own regression oracle is a
  *magnitude relative residual* <= 1e-6 (sum((F-D)^2)/sum(F^2)), which
  complex64 passes with orders of magnitude to spare.
* ``double`` — float64 / complex128. Verification mode for CPU parity runs
  against the NumPy oracle. Requires ``jax.config.update("jax_enable_x64",
  True)`` (done by the test harness), not supported on TPU.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    real: jnp.dtype
    complex: jnp.dtype

    @property
    def name(self) -> str:
        return "double" if self.real == jnp.float64 else "single"


SINGLE = Precision(real=jnp.dtype(jnp.float32), complex=jnp.dtype(jnp.complex64))
DOUBLE = Precision(real=jnp.dtype(jnp.float64), complex=jnp.dtype(jnp.complex128))

_DEFAULT = SINGLE


def get_precision(precision=None) -> Precision:
    """Resolve a precision argument: None -> default, str -> named policy."""
    if precision is None:
        return _DEFAULT
    if isinstance(precision, Precision):
        return precision
    if isinstance(precision, str):
        if precision in ("single", "float32", "complex64"):
            return SINGLE
        if precision in ("double", "float64", "complex128"):
            return DOUBLE
        raise ValueError(f"Unknown precision {precision!r}")
    raise TypeError(f"Bad precision spec: {precision!r}")


def set_default_precision(precision) -> None:
    global _DEFAULT
    _DEFAULT = get_precision(precision)

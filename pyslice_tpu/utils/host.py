"""Host <-> device transfer helpers.

Complex buffers cannot cross the host/device boundary on some TPU runtimes
(the PJRT transfer layer, unlike the compiler, has no complex dtypes — this
is true of the axon v5e relay this framework targets). The rule encoded
here: *complex math stays inside compiled programs; transfers are always
real*. These helpers split/recombine real and imaginary parts on the correct
side of the boundary, and are no-op passthroughs for real arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@functools.partial(jax.jit, static_argnames=("shape", "dtype"))
def device_zeros(shape, dtype):
    """Device-side zeros through ONE process-lifetime jitted program.

    ``jax.jit(lambda: jnp.zeros(...))()`` at a call site creates a fresh
    closure per call, so every call pays a retrace + compile-cache lookup
    round trip (measured ~0.1-0.3 s through the axon relay) for a trivial
    program. A module-level jit with static (shape, dtype) traces once per
    shape per process. ``dtype`` must be hashable (np.dtype, jnp scalar
    type, or dtype name string)."""
    return jnp.zeros(shape, jnp.dtype(dtype))


def to_device_complex(z, dtype=jnp.complex64):
    """Host complex ndarray -> device complex array (two real transfers)."""
    z = np.asarray(z)
    real_dtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    return _combine(jnp.asarray(np.ascontiguousarray(z.real), real_dtype),
                    jnp.asarray(np.ascontiguousarray(z.imag), real_dtype))


def to_numpy(x) -> np.ndarray:
    """Device array -> host ndarray; complex arrays via real/imag split."""
    if isinstance(x, np.ndarray):
        return x
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        re = np.asarray(jnp.real(x))
        im = np.asarray(jnp.imag(x))
        return re + 1j * im
    return np.asarray(x)


def put_complex_or_real(x, complex_dtype=jnp.complex64):
    """Move host data to device, splitting complex; device arrays pass through."""
    if isinstance(x, np.ndarray) and np.iscomplexobj(x):
        return to_device_complex(x, complex_dtype)
    return jnp.asarray(x)

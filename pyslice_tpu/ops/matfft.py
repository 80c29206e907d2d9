"""Matmul FFT — DFT via four-step Cooley-Tukey on the MXU.

XLA's TPU FFT runs on the VPU at a fraction of HBM bandwidth; on TPU the
fastest way to transform the ~1k-point axes of a multislice grid is to
express the DFT as matrix products and let the MXU eat them (the classic
TPU trick). For n = n1*n2 (four-step / six-step algorithm):

    x[a1, a2]  (a = a1*n2 + a2)
    y[k1, a2]  = sum_a1 W1[k1, a1] x[a1, a2]       (matmul, W1 = DFT_n1)
    y[k1, a2] *= T[k1, a2]                          (twiddle, exp(s*2pi*i*k1*a2/n))
    z[k1, k2]  = sum_a2 y[k1, a2] W2[k2, a2]       (matmul, W2 = DFT_n2)
    X[k2*n1 + k1] = z[k1, k2]                       (transpose + reshape)

This does ~2*n*(n1+n2) complex MACs per transform — more FLOPs than a true
FFT's 5n log n, but they run at MXU rates instead of VPU rates, which wins
by a large factor at multislice sizes. Prime n falls back to a single full
DFT matmul (n^2 MACs — still competitive for n <= a few hundred).

Accuracy: fp32 accumulation over <=~64-term products; relative error ~1e-6,
far inside the 1e-6 *squared-residual* regression bar (tests assert this
against jnp.fft). Grids here are static, so plans (factorization + DFT/
twiddle constants) are baked per size at trace time.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def balanced_factors(n: int) -> Tuple[int, int]:
    """(n1, n2) with n1*n2 == n and max(n1, n2) minimal; (n, 1) for primes."""
    best = (n, 1)
    f = int(np.sqrt(n))
    while f >= 2:
        if n % f == 0:
            return (n // f, f)
        f -= 1
    return best


@functools.lru_cache(maxsize=64)
def _plan(n: int, inverse: bool, dtype_name: str):
    """Host-side constants for one transform size: (n1, n2, W1, W2, T)."""
    sign = 1.0 if inverse else -1.0
    n1, n2 = balanced_factors(n)
    dt = np.complex64 if dtype_name == "complex64" else np.complex128
    if n2 == 1:
        k = np.arange(n)
        w = np.exp(sign * 2j * np.pi * np.outer(k, k) / n).astype(dt)
        return n1, n2, w, None, None
    a1 = np.arange(n1)
    a2 = np.arange(n2)
    w1 = np.exp(sign * 2j * np.pi * np.outer(a1, a1) / n1).astype(dt)
    w2 = np.exp(sign * 2j * np.pi * np.outer(a2, a2) / n2).astype(dt)
    t = np.exp(sign * 2j * np.pi * np.outer(a1, a2) / n).astype(dt)
    return n1, n2, w1, w2, t


def _consts(arr_np, like):
    """Bring a host complex constant on device without a complex transfer."""
    re = jnp.asarray(np.ascontiguousarray(arr_np.real), dtype=jnp.real(like).dtype)
    im = jnp.asarray(np.ascontiguousarray(arr_np.imag), dtype=jnp.real(like).dtype)
    return jax.lax.complex(re, im)


def _fft_last(x, inverse: bool):
    """Transform along the last axis via the four-step matmul algorithm."""
    n = x.shape[-1]
    dtype_name = "complex64" if x.dtype == jnp.complex64 else "complex128"
    n1, n2, w1, w2, t = _plan(n, inverse, dtype_name)
    pet = x.dtype

    # HIGHEST precision: full-fp32 MXU passes. DEFAULT would drop to bf16
    # (~6e-3 relative error — far outside the regression bar); HIGHEST
    # keeps ~2e-7.
    ein = functools.partial(jnp.einsum, preferred_element_type=pet,
                            precision=jax.lax.Precision.HIGHEST)
    if n2 == 1:   # prime size: single full DFT matmul
        w = _consts(w1, x)
        out = ein("...a,ka->...k", x, w)
    else:
        w1 = _consts(w1, x)
        w2 = _consts(w2, x)
        t = _consts(t, x)
        v = x.reshape(x.shape[:-1] + (n1, n2))
        y = ein("ba,...an->...bn", w1, v)               # (..., k1, a2)
        y = y * t
        z = ein("...bn,cn->...bc", y, w2)               # (..., k1, k2)
        out = jnp.swapaxes(z, -1, -2).reshape(x.shape[:-1] + (n,))
    if inverse:
        out = out * (1.0 / n)
    return out


def fft_matmul(x, axis: int = -1):
    x = jnp.moveaxis(x, axis, -1)
    out = _fft_last(x, inverse=False)
    return jnp.moveaxis(out, -1, axis)


def ifft_matmul(x, axis: int = -1):
    x = jnp.moveaxis(x, axis, -1)
    out = _fft_last(x, inverse=True)
    return jnp.moveaxis(out, -1, axis)


def fft2_matmul(x):
    """2-D FFT over the last two axes (matches jnp.fft.fft2 semantics)."""
    return fft_matmul(fft_matmul(x, axis=-1), axis=-2)


def ifft2_matmul(x):
    return ifft_matmul(ifft_matmul(x, axis=-1), axis=-2)


# --- dispatch: pick the fastest correct transform per size -------------------
#
# Measured on TPU v5e (16 x 1024^2 complex64 and odd-size neighbors):
# XLA's FFT wins slightly at powers of two (4.6 ms vs 5.6 ms per fft2) but
# loses 2-5x on general composite/prime sizes (9-11 ms vs 2-5 ms) — and
# general sizes are this workload's norm (grid points = int(l/sampling)+1).

def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _prefer_matmul(n: int) -> bool:
    if jax.default_backend() != "tpu":
        return False                      # CPU/GPU FFT libraries are fine
    return not _is_pow2(n)


def fft(x, axis: int = -1):
    """1-D FFT along ``axis``, fastest-correct path for the size."""
    if _prefer_matmul(x.shape[axis]):
        return fft_matmul(x, axis)
    return jnp.fft.fft(x, axis=axis)


def ifft(x, axis: int = -1):
    if _prefer_matmul(x.shape[axis]):
        return ifft_matmul(x, axis)
    return jnp.fft.ifft(x, axis=axis)


def fft2(x):
    """2-D FFT over the last two axes, fastest-correct path per axis size."""
    x = fft_matmul(x, -1) if _prefer_matmul(x.shape[-1]) else jnp.fft.fft(x, axis=-1)
    x = fft_matmul(x, -2) if _prefer_matmul(x.shape[-2]) else jnp.fft.fft(x, axis=-2)
    return x


def ifft2(x):
    x = ifft_matmul(x, -1) if _prefer_matmul(x.shape[-1]) else jnp.fft.ifft(x, axis=-1)
    x = ifft_matmul(x, -2) if _prefer_matmul(x.shape[-2]) else jnp.fft.ifft(x, axis=-2)
    return x

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


def _bf16_split(x):
    """(hi, lo) with hi exactly bf16-representable and hi + lo == x.

    Implemented by masking the low 16 mantissa bits (truncation) rather
    than convert round-trips: XLA's algebraic simplifier folds
    x - f32(bf16(x)) to ZERO (measured — the correction dots vanish and
    the result silently degrades to single-pass bf16). Bitwise ops are
    opaque to that rewrite."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & np.uint32(0xFFFF0000),
                                      jnp.float32)
    return hi, x - hi


def complex_dot_fast(pattern, a, b):
    """complex64 contraction via Karatsuba + hand bf16x3: nine single-pass
    real dots (t1 = ar@br, t2 = ai@bi, t3 = (ar+ai)@(br+bi); each product
    hi/lo split, ~2^-16 relative error).

    This exists for COMPILE time as much as run time: a complex einsum at
    Precision.HIGHEST takes ~200 s to compile through the remote-compile
    relay at multislice sizes (XLA's f32 emulation expansion), vs ~1 s for
    this formulation — and it runs ~2x faster at ~the same accuracy
    (checksums match HIGHEST to 6 digits)."""
    ar, ai = jnp.real(a), jnp.imag(a)
    br, bi = jnp.real(b), jnp.imag(b)
    dot = functools.partial(jnp.einsum, pattern,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)

    def p3(x, y):
        xh, xl = _bf16_split(x)
        yh, yl = _bf16_split(y)
        return dot(xh, yh) + dot(xl, yh) + dot(xh, yl)

    t1 = p3(ar, br)
    t2 = p3(ai, bi)
    t3 = p3(ar + ai, br + bi)
    return jax.lax.complex(t1 - t2, t3 - t1 - t2)


def complex_einsum(pattern, a, b):
    """Precision-dispatching complex contraction: complex64 -> the fast
    Karatsuba/bf16x3 form; complex128 (CPU verification mode) -> exact
    HIGHEST einsum. ops.config.complex_einsum = high|highest overrides the
    complex64 strategy (accuracy studies; PYSLICE_CEINSUM seeds it).
    Read at trace time — physics.propagate folds it into its jit cache key
    (ops.config.ops_key); other jitted callers bake it into their traces."""
    if a.dtype == jnp.complex64:
        from . import config
        mode = config.complex_einsum
        # Small problems get exact f32 for free (the bf16x3 trade only pays
        # at MXU-saturating sizes) — e.g. tiny verification grids.
        if mode == "kara" and a.size >= (1 << 20):
            return complex_dot_fast(pattern, a, b)
        if mode in ("high", "highest"):
            prec = getattr(jax.lax.Precision, mode.upper())
        else:
            prec = jax.lax.Precision.HIGHEST
        return jnp.einsum(pattern, a, b, preferred_element_type=a.dtype,
                          precision=prec)
    return jnp.einsum(pattern, a, b, preferred_element_type=a.dtype,
                      precision=jax.lax.Precision.HIGHEST)


# Prime sizes above this run Bluestein's chirp-Z algorithm instead of the
# O(n^2) full-DFT matmul: X = a * ifft_m(fft_m(x*a) * FFT(b)) with m the
# next power of two >= 2n-1, so the heavy lifting is two pow2 XLA FFTs
# (O(n log n)). MEASURED on v5e at 1009^2 x 16: the MXU's O(n^2) full DFT
# is 3.5x FASTER than Bluestein (932 vs 288 slice-steps/s — XLA's TPU FFT
# constant is that bad), so the threshold sits above every realistic grid
# and Bluestein only guards the asymptotic blowup of enormous primes.
BLUESTEIN_MIN = 4096


@functools.lru_cache(maxsize=32)
def _bluestein_plan(n: int, inverse: bool):
    """Host-side chirp constants: (m, a, B) with a_j = exp(s*i*pi*j^2/n),
    b = conj(a) wrapped circularly into length m, B = FFT(b). Phases are
    reduced exactly via j^2 mod 2n (integer) before the float multiply."""
    m = 1 << (2 * n - 1).bit_length()
    k = np.arange(n, dtype=np.int64)
    ph = (k * k % (2 * n)).astype(np.float64) * (np.pi / n)
    sign = 1.0 if inverse else -1.0
    a = np.exp(sign * 1j * ph)
    b = np.conj(a)
    bp = np.zeros(m, np.complex128)
    bp[:n] = b
    bp[m - n + 1:] = b[1:][::-1]          # negative lags, wrapped
    return m, a, np.fft.fft(bp)


def _bluestein_last(x, inverse: bool):
    n = x.shape[-1]
    m, a, B = _bluestein_plan(n, inverse)
    a_c = _consts(a, x)
    B_c = _consts(B, x)
    y = jnp.fft.fft(x * a_c, n=m, axis=-1)        # zero-padded pow2 FFT
    z = jnp.fft.ifft(y * B_c, axis=-1)[..., :n]
    out = (z * a_c).astype(x.dtype)
    if inverse:
        out = out * (1.0 / n)
    return out


def _fft_last(x, inverse: bool):
    """Transform along the last axis via the four-step matmul algorithm."""
    n = x.shape[-1]
    dtype_name = "complex64" if x.dtype == jnp.complex64 else "complex128"
    n1, n2, w1, w2, t = _plan(n, inverse, dtype_name)
    pet = x.dtype

    if n2 == 1 and n >= BLUESTEIN_MIN:
        return _bluestein_last(x, inverse)

    # complex64 -> Karatsuba/bf16x3 dots (see complex_dot_fast: ~2x faster
    # AND ~200x faster to compile than HIGHEST through the remote relay);
    # complex128 (CPU verification) -> exact HIGHEST.
    del pet
    ein = complex_einsum
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


# --- scrambled (digit-permuted) transforms ------------------------------------
#
# The four-step DFT's only data movement beyond its two matmuls is the final
# digit transpose (swapaxes + reshape above) — on TPU that relayout costs as
# much as a matmul stage. Inside the multislice loop the transform is always
# sandwiched around a *diagonal* k-space multiply (the Fresnel propagator), so
# frequency ORDER is irrelevant: we emit k-space in digit-scrambled order
# (position p = k1*n2 + k2 holds true frequency k2*n1 + k1), pre-scramble the
# propagator to match, and let the inverse transform consume scrambled order
# directly. Forward and inverse are then two einsums + one fused elementwise
# each — ZERO transposes, the same trick ops.fused_step uses in Pallas
# (digit_perm / pre-permuted Fresnel multipliers), here in pure XLA for
# arbitrary composite sizes (reference grids are int(l/s)+1 — generically odd).


def _fused_split_cost(d: int, m: int) -> float:
    """Per-point cost model of one (d, m) split in the FUSED Pallas odd
    kernel, in MXU-slot units — calibrated on v5e at 1023^2 x 16 probes
    (round 4): stage-2 is a dense (m, m) dot padded to 128-multiples
    (ceil(m/128)^2 * 128^2 / m slots/point) and stage-1 is d unrolled
    VPU tile-cMACs, measured at ~15 slot-equivalents each after the
    (8, 128) tile padding of an (m, m) tile. Measured wall ratios it
    reproduces: d=3 (432+51) vs d=11 (176+234) -> 1.18 modeled, 1.16
    measured (4,494 -> 5,227 slice-steps/s)."""
    tiles = -(-m // 128)
    mxu = tiles * tiles * 16384.0 / m
    pad = (-(-m // 8) * 8) * (tiles * 128.0) / (m * m)
    return mxu + 15.0 * d * pad


def scrambled_factors(n: int, n_probes: int = None) -> Tuple[int, int]:
    """(n1, n2) split for the scrambled four-step: n1 SMALL (the unrolled
    elementwise FMA stage), n2 = n/n1 LARGE (one big matmul on the MXU).
    Tiny *balanced* factors (e.g. 33x31) make XLA emit batched
    micro-matmuls that waste >90% of the MXU — measured slower than the
    transpose-heavy path they replace.

    Default (``n_probes`` unset): smallest divisor d of n with
    2 <= d <= 16 — the XLA scrambled path's measured best (1023^2 at
    HIGHEST, d=3: 1612 vs d=11: 1015 slice-steps/s) and the factorization
    the VMEM-resident odd kernels are tuned for (d=3 resident beats any
    d=11 path at 1 probe: 4,689 vs 3,795). The MULTI-PROBE fused odd
    chain passes ``n_probes >= 2``: there the measured-calibrated
    _fused_split_cost picks the divisor (1023 x 16 probes: d=11/m=93 at
    5,227 vs d=3/m=341 at 4,494 slice-steps/s — round-4 measurement),
    with m >= 64 and a >= 10% modeled-improvement hysteresis (only 1023
    is hardware-calibrated). Falls back to (n, 1) for primes (scrambled
    path then unsupported).
    """
    from . import config
    override = config.scrambled_d           # PYSLICE_SCRAMBLED_D seeds it
    if override and n % int(override) == 0 and 1 < int(override) < n:
        d = int(override)
        return (d, n // d)
    divisors = [d for d in range(2, 17) if n % d == 0]
    if not divisors:
        return (n, 1)
    d0 = divisors[0]
    if n_probes is not None and n_probes >= 2:
        # Candidates the fused odd kernel accepts (footprint bound mirrors
        # fused_step_odd.supported_size_odd, not importable here (cycle)).
        fused = [d for d in divisors
                 if n // d >= 64
                 and n * (n // d) * 4 * 17 < 60 * 1024 * 1024]
        if d0 in fused and len(fused) > 1:
            best = min(fused, key=lambda d: _fused_split_cost(d, n // d))
            if _fused_split_cost(best, n // best) < \
                    0.9 * _fused_split_cost(d0, n // d0):
                d0 = best           # >= 10% modeled gain: switch
    return (d0, n // d0)


def scramble_perm(n: int, n_probes: int = None) -> np.ndarray:
    """perm[p] = true frequency index stored at scrambled position p
    (p = k1*n2 + k2  ->  k = k2*n1 + k1, with (n1, n2) = scrambled_factors;
    ``n_probes`` must match the kernel that produced/consumes the order)."""
    n1, n2 = scrambled_factors(n, n_probes)
    p = np.arange(n)
    return (p % n2) * n1 + p // n2


def scrambled_ok(n: int) -> bool:
    """Scrambled path needs a composite size (primes have no digit split)."""
    return scrambled_factors(n)[1] > 1


@functools.lru_cache(maxsize=64)
def _scrambled_plan(n: int, dtype_name: str, d: int, m: int):
    """Forward/inverse four-step constants with twiddles FOLDED into the
    stage-2 matrices (one (n1, n2, n2) batched-matmul constant per
    direction — no separate twiddle pass):

    Forward (natural in, scrambled out):
        y[k1,a2] = sum_a1 W1[k1,a1] x[a1,a2]           (unrolled FMA, n1^2 terms)
        z[k1,k2] = sum_a2 (T[k1,a2] W2[k2,a2]) y[k1,a2] (batched matmul over k1)
    Inverse (scrambled in, natural out; 1/n folded into W1i):
        u[k1,a2] = sum_k2 conj(W2)[a2,k2] z[k1,k2], then * conj(T)[k1,a2]
                 = sum_k2 (conj(T)[k1,a2] conj(W2)[k2,a2]) z[k1,k2]
        x[a1,a2] = sum_k1 W1i[a1,k1] u[k1,a2]
    """
    n1, n2 = d, m
    dt = np.complex64 if dtype_name == "complex64" else np.complex128
    a1 = np.arange(n1)
    a2 = np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(a1, a1) / n1)
    w2 = np.exp(-2j * np.pi * np.outer(a2, a2) / n2)         # (k2, a2), symmetric
    t = np.exp(-2j * np.pi * np.outer(a1, a2) / n)           # (k1, a2)
    # fwd2[k1, a2, k2] = T[k1, a2] * W2[k2, a2]  (contract a2, last-dim matmul)
    fwd2 = (t[:, :, None] * w2.T[None, :, :]).astype(dt)
    # inv2[k1, k2, a2] = conj(T)[k1, a2] * conj(W2)[k2, a2]
    inv2 = (np.conj(t)[:, None, :] * np.conj(w2)[None, :, :]).astype(dt)
    w1c = [[complex(w1[k, a]) for a in range(n1)] for k in range(n1)]
    w1ic = [[complex(np.conj(w1[a, k])) / n for k in range(n1)]
            for a in range(n1)]
    return n1, n2, w1c, w1ic, fwd2, inv2


def _plan_consts(n, x):
    dtype_name = "complex64" if x.dtype == jnp.complex64 else "complex128"
    # The factorization participates in the cache key: config.scrambled_d
    # can change mid-process (benchmarks), and a stale cached plan would
    # silently desync from scramble_perm's ordering.
    d, m = scrambled_factors(n)
    n1, n2, w1c, w1ic, fwd2, inv2 = _scrambled_plan(n, dtype_name, d, m)
    return n1, n2, w1c, w1ic, _consts(fwd2, x), _consts(inv2, x)


def _stage1(v_slices, coeffs):
    """Unrolled small-DFT stage: out[k] = sum_a coeffs[k][a] * v_slices[a].
    Pure fused elementwise work (the n1 factor is small by construction)."""
    outs = []
    for row in coeffs:
        acc = row[0] * v_slices[0]
        for a in range(1, len(v_slices)):
            acc = acc + row[a] * v_slices[a]
        outs.append(acc)
    return outs


def _stage2(y, mat, k1_axis):
    """Batched last-dim matmul: contract y's last dim against mat[k1],
    where k1 is y's ``k1_axis`` dim. mat: (n1, last, out)."""
    # Move nothing: einsum with k1 as a shared batch label; contraction is
    # over the minor (contiguous) dim on both sides.
    if k1_axis == -2:
        return complex_einsum("...kb,kbc->...kc", y, mat)
    if k1_axis == -3:
        return complex_einsum("...kbm,kbc->...kcm", y, mat)
    raise ValueError(k1_axis)


def fft_scrambled(x, axis: int):
    """Forward DFT along ``axis`` (-1 or -2), natural order in, digit-
    scrambled order out (see scramble_perm). One unrolled FMA stage + one
    big batched matmul — no transposes anywhere."""
    n = x.shape[axis]
    n1, n2, w1c, _, fwd2, _ = _plan_consts(n, x)
    if axis == -1:
        v = x.reshape(x.shape[:-1] + (n1, n2))
        ys = _stage1([v[..., a, :] for a in range(n1)], w1c)
        y = jnp.stack(ys, axis=-2)                    # (..., k1, a2)
        z = _stage2(y, fwd2, k1_axis=-2)              # (..., k1, k2)
        return z.reshape(x.shape)
    if axis == -2:
        m = x.shape[-1]
        v = x.reshape(x.shape[:-2] + (n1, n2, m))
        ys = _stage1([v[..., a, :, :] for a in range(n1)], w1c)
        y = jnp.stack(ys, axis=-3)                    # (..., k1, a2, m)
        z = _stage2(y, fwd2, k1_axis=-3)              # (..., k1, k2, m)
        return z.reshape(x.shape)
    raise ValueError("axis must be -1 or -2")


def ifft_scrambled(x, axis: int):
    """Inverse DFT along ``axis``: digit-scrambled order in, natural out."""
    n = x.shape[axis]
    n1, n2, _, w1ic, _, inv2 = _plan_consts(n, x)
    if axis == -1:
        v = x.reshape(x.shape[:-1] + (n1, n2))        # (..., k1, k2)
        u = _stage2(v, inv2, k1_axis=-2)              # (..., k1, a2)
        outs = _stage1([u[..., k, :] for k in range(n1)], w1ic)
        out = jnp.stack(outs, axis=-2)                # (..., a1, a2)
        return out.reshape(x.shape)
    if axis == -2:
        m = x.shape[-1]
        v = x.reshape(x.shape[:-2] + (n1, n2, m))
        u = _stage2(v, inv2, k1_axis=-3)
        outs = _stage1([u[..., k, :, :] for k in range(n1)], w1ic)
        out = jnp.stack(outs, axis=-3)
        return out.reshape(x.shape)
    raise ValueError("axis must be -1 or -2")


def fft2_scrambled(x):
    """2-D forward, both axes digit-scrambled: equals
    fft2(x)[..., perm_x, :][..., :, perm_y] with perm = scramble_perm."""
    return fft_scrambled(fft_scrambled(x, -1), -2)


def ifft2_scrambled(x):
    return ifft_scrambled(ifft_scrambled(x, -2), -1)


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

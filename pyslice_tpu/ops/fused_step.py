"""Fused Pallas multislice step — the north-star kernel.

The multislice inner loop is psi <- ifft2(P * fft2(t_s * psi)). The XLA path
spends ~6 HBM passes per slice (1-D FFT passes + transposes + elementwise).
This kernel pair reduces it to TWO fused passes per slice by keeping the
wavefunction in a mixed real/reciprocal representation between passes and
alternating x-major / y-major storage:

    A_first :  (x, y)    --  * t_1,  FFT_y          -->  (x, ky)  x-major
    B       :  (x, ky)   --  FFT_x, * P, IFFT_x     -->  (x, ky)  y-major
    A_mid   :  y-major   --  IFFT_y, * t_s, FFT_y   -->  x-major
    A_last  :  y-major   --  IFFT_y, * t_nz         -->  exit wave (x, y)

Each kernel reads and writes the array exactly once. The 1-D transforms run
on the MXU inside VMEM via the four-step matmul DFT with n = n1 * 128:
stage 2 contracts over 128 lanes (a perfect MXU tile, ~95% of the FLOPs, at
HIGHEST precision — in-kernel f32 dots otherwise drop to bf16, 1e-2 error),
stage 1 is unrolled scalar FMAs on the VPU, and twiddles are folded into
per-k1 stage-2 matrices. Frequencies stay digit-permuted between kernels
(digit_perm); the Fresnel multiplier is pre-permuted to match, so no
reordering data movement exists anywhere.

Layout changes happen at kernel ENTRY: each kernel reads the orthogonal
BlockSpec block of its producer's natural-layout output and consumes it
column-major through lhs-transposed MXU contractions (einsum 'nr,nc->rc' —
free on the systolic array). This is load-bearing: Mosaic's compiler takes
*hours* on kernels containing explicit transposes adjacent to matmul
combinations (transpose-of-dot-sums or dots-of-transposes), but compiles
this formulation in seconds. Stores are always natural.

Scope (v1): float32/complex64, both grid axes divisible by 128 with
n1 = n/128 <= 256, no depth recording. physics.propagate auto-dispatches and
falls back to the unfused path otherwise. Complex values travel as separate
re/im planes (Pallas TPU has no complex dtype); measured 3.2x over the XLA
path at 1024^2 x 16 probes on v5e (residual 7e-12).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np


def supported_size(n: int) -> bool:
    return n % 128 == 0 and 1 <= n // 128 <= 256


# Precomputed (cos, sin) transmission planes double the per-frame HBM
# footprint of the transmission data vs the raw sigma*V stack (e.g. +400 MB
# at 1024^2 x 100 slices — round-2 advisor finding). Above this byte budget
# for the (cos, sin) pair, kernel A streams a single sigma*V plane and takes
# cos/sin in-kernel instead: ~53 us/1M-pixel step of VPU transcendentals
# repeated per probe, but half the transmission high-water mark — capacity
# beats speed when the stack is GBs deep.
PRECOMPUTE_T_MAX_BYTES = 2 << 30


def _chain_t_planes(sigma, potential_szy):
    """(t_re, t_im) precomputed planes, or (sigma_V,) above the capacity
    threshold (see PRECOMPUTE_T_MAX_BYTES)."""
    if 2 * 4 * potential_szy.size > PRECOMPUTE_T_MAX_BYTES:
        return (jnp.asarray(sigma, jnp.float32)
                * potential_szy.astype(jnp.float32),)
    return transmission_planes(sigma, potential_szy)


def _split_hi_lo(x64: np.ndarray):
    """f64 constant -> (hi, lo) f32 pair with hi exactly bf16-representable
    and hi + lo == f32(x) exactly (for the in-kernel bf16x3 dots)."""
    full = x64.astype(np.float32)
    import jax.numpy as _jnp
    hi = np.asarray(full.astype(_jnp.bfloat16)).astype(np.float32)
    lo = (full - hi).astype(np.float32)
    return hi, lo


def _dft_consts(n: int, mode: str):
    """Four-step constants for n = n1 * 128.

    Twiddles are folded into per-k1 stage-2 matrices (z = y @ (diag(tw_k1)
    @ W2) for the forward, u = x @ (conj(W2) * conj(tw_k1)[None, :]) for the
    inverse), so kernels do no twiddle multiplies or narrow-row slicing —
    only clean (R,128) @ (128,128) dots and static sublane slices. Stage-1
    runs as radix-2 butterflies across the digit tiles when n1 is a power
    of two (12 tile-ops for n1=8 vs 64 for the unrolled matrix form — the
    VPU stage was the post-bf16x3 bottleneck), falling back to the unrolled
    DFT for odd factors; the inverse 1/n scale is folded into the inverse
    stage-2 matrices.

    ``mode``: 'highest'/'default' -> 6 const planes (fwd re/im/sum,
    inv re/im/sum — the sum planes feed the Karatsuba 3-product complex
    dot); 'bf16x3' -> 12 planes (each split into a bf16-representable hi
    part and an f32 lo remainder — see _make_cdot).
    """
    n2 = 128
    n1 = n // n2
    a1 = np.arange(n1)
    a2 = np.arange(n2)
    w1 = np.exp(-2j * np.pi * np.outer(a1, a1) / n1)     # (n1, n1)
    w2 = np.exp(-2j * np.pi * np.outer(a2, a2) / n2)     # (n2, n2), symmetric
    tw = np.exp(-2j * np.pi * np.outer(a1, a2) / n)      # (n1, n2)
    # forward: stacked (n1*128, 128) of diag(tw[k1]) @ W2
    fwd = np.concatenate([tw[k1][:, None] * w2 for k1 in range(n1)], axis=0)
    # inverse: stacked conj(W2) * conj(tw[k1]) (columns scaled); the 1/n
    # normalization lives HERE so stage 1 stays pure butterflies
    inv = np.concatenate([np.conj(w2) * np.conj(tw[k1])[None, :] / n
                          for k1 in range(n1)], axis=0)
    del w1     # stage 1 derives its butterfly twiddles in _tile_dft
    f32 = np.float32
    raw = [fwd.real, fwd.imag, fwd.real + fwd.imag,
           inv.real, inv.imag, inv.real + inv.imag]
    if mode == "bf16x3":
        planes = ([_split_hi_lo(r)[0] for r in raw]
                  + [_split_hi_lo(r)[1] for r in raw])
    else:
        planes = [r.astype(f32) for r in raw]
    return (n1, n2, planes)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _scalar_cmul(w: complex, tr, ti):
    """python-complex-scalar * tile, with the free special cases."""
    if w == 1:
        return tr, ti
    if w == -1:
        return -tr, -ti
    if w == -1j:
        return ti, -tr
    if w == 1j:
        return -ti, tr
    c, s = w.real, w.imag
    return c * tr - s * ti, c * ti + s * tr


def _tile_dft(tr, ti, sign: int):
    """DFT across a LIST of tiles (the four-step's small stage-1 factor),
    radix-2 Cooley-Tukey while the length is even (n1/2 * log2-ish tile
    multiply-adds instead of n1^2), unrolled dense DFT at odd lengths.
    sign=-1 forward, +1 inverse (unnormalized)."""
    m = len(tr)
    if m == 1:
        return tr, ti
    if m % 2:
        outs_r, outs_i = [], []
        for k in range(m):
            zr, zi = _scalar_cmul(
                np.exp(sign * 2j * np.pi * 0 * k / m), tr[0], ti[0])
            for a in range(1, m):
                w = complex(np.exp(sign * 2j * np.pi * a * k / m))
                pr, pi = _scalar_cmul(w, tr[a], ti[a])
                zr = zr + pr
                zi = zi + pi
            outs_r.append(zr)
            outs_i.append(zi)
        return outs_r, outs_i
    er, ei = _tile_dft(tr[0::2], ti[0::2], sign)
    orr, oii = _tile_dft(tr[1::2], ti[1::2], sign)
    half = m // 2
    outs_r = [None] * m
    outs_i = [None] * m
    for k in range(half):
        w = complex(np.exp(sign * 2j * np.pi * k / m))
        pr, pi = _scalar_cmul(w, orr[k], oii[k])
        outs_r[k] = er[k] + pr
        outs_i[k] = ei[k] + pi
        outs_r[k + half] = er[k] - pr
        outs_i[k + half] = ei[k] - pi
    return outs_r, outs_i


def _dot_mode() -> str:
    """Stage-2 MXU dot strategy (ops.config.fused_dot; PYSLICE_FUSED_DOT
    seeds it at import):

    * 'bf16x3' (default) — hand-split hi/lo bf16 pairs: 3 single-pass dots
      per real product, ~2^-16 relative error. Measured 8,237 slice-steps/s
      at 1024^2 x 16 on v5e vs 5,473 at 'highest' (1.51x), with the
      e2e checksum agreeing to 5e-5 — Mosaic has no Precision.HIGH, so this
      is the hand-rolled equivalent (ROADMAP #3 / VERDICT item 5).
    * 'highest' — full-f32 MXU passes (~1e-7): verification runs.
    * 'default' — single bf16 pass (~6e-3): timing experiments only.

    Read at trace time; physics.propagate includes it in its jit cache key
    (config.ops_key) so mid-process flips retrace rather than desync.
    """
    from . import config
    return config.fused_dot


def digit_perm(n: int) -> np.ndarray:
    """perm[p] = true frequency index stored at position p.

    The in-kernel forward transform emits X in digit-permuted order:
    position p = k1 * n2 + k2 holds frequency k = k2 * n1 + k1. Frequency-
    domain multipliers (the Fresnel factor) are pre-permuted with this map,
    and the inverse transform consumes the permuted order directly — no
    in-kernel data transposes or 3-D reshapes anywhere (Mosaic-friendly).
    """
    n2 = 128
    n1 = n // n2
    p = np.arange(n)
    k1, k2 = p // n2, p % n2
    return k2 * n1 + k1


def _make_cdot(mode: str, tin: bool):
    """Complex (R, n2) x (n2, n2) dot at the selected MXU strategy.

    All modes use the Karatsuba 3-product form (W-sums precomputed):
        t1 = yr@Wr, t2 = yi@Wi, t3 = (yr+yi)@(Wr+Wi)
        re = t1 - t2,  im = t3 - t1 - t2
    — 25% fewer MXU passes than the 4-product form at a ~2x error constant
    (still ~2^-16 relative in bf16x3 mode: hi/lo split per product,
    a@W ~= ah@Wh + al@Wh + ah@Wl, the hand-rolled Precision.HIGH Mosaic
    lacks). 'highest' = full-f32 dots; 'default' = single bf16 pass (timing
    experiments only). Returns cdot(yr, yi, consts_tuple) -> (re, im)."""
    prec = (jax.lax.Precision.HIGHEST if mode == "highest"
            else jax.lax.Precision.DEFAULT)
    dot = functools.partial(jnp.einsum,
                            "nr,nc->rc" if tin else "rn,nc->rc",
                            preferred_element_type=jnp.float32,
                            precision=prec)
    if mode != "bf16x3":
        def cdot(yr, yi, w):
            wr, wi, ws = w
            t1 = dot(yr, wr)
            t2 = dot(yi, wi)
            t3 = dot(yr + yi, ws)
            return t1 - t2, t3 - t1 - t2
        return cdot

    def cdot(yr, yi, w):
        wr, wi, ws, wrl, wil, wsl = w
        # Explicitly rounded hi parts: the decomposition must use yh (not
        # raw y) in the yh@Wh and yh@Wl products — on hardware DEFAULT dots
        # round operands anyway, but the interpreter (and any exact dot)
        # would otherwise double-count the lo contribution.
        ysum = yr + yi
        yhr = yr.astype(jnp.bfloat16).astype(jnp.float32)
        yhi = yi.astype(jnp.bfloat16).astype(jnp.float32)
        yhs = ysum.astype(jnp.bfloat16).astype(jnp.float32)

        def p(a, ah, b, bl):
            return dot(ah, b) + dot(a - ah, b) + dot(ah, bl)
        t1 = p(yr, yhr, wr, wrl)
        t2 = p(yi, yhi, wi, wil)
        t3 = p(ysum, yhs, ws, wsl)
        return t1 - t2, t3 - t1 - t2
    return cdot


def _fwd_w(planes, mode, k1, n2):
    """Per-k1 stage-2 matrices (re, im, sum[, lo...]) for the forward
    transform."""
    s = slice(k1 * n2, (k1 + 1) * n2)
    if mode == "bf16x3":
        return (planes[0][s], planes[1][s], planes[2][s],
                planes[6][s], planes[7][s], planes[8][s])
    return (planes[0][s], planes[1][s], planes[2][s])


def _inv_w(planes, mode, k1, n2):
    s = slice(k1 * n2, (k1 + 1) * n2)
    if mode == "bf16x3":
        return (planes[3][s], planes[4][s], planes[5][s],
                planes[9][s], planes[10][s], planes[11][s])
    return (planes[3][s], planes[4][s], planes[5][s])


def _fft_minor_perm(re, im, static, planes, tin: bool = False):
    """Forward DFT along the transform axis: natural order in, digit-
    permuted order out, row-major (R, N) result.

    ``tin``: input planes are column-major (N, R) — the raw orthogonal
    block read. The stage-2 contraction then runs as einsum('nr,nc->rc'),
    an lhs-transposed matmul (free on the MXU) — never an explicit
    transpose op, which sends Mosaic's compiler into the weeds.
    """
    n1, n2, mode = static
    cdot = _make_cdot(mode, tin)
    sl = ((lambda t, a: t[a * n2:(a + 1) * n2, :]) if tin
          else (lambda t, a: t[:, a * n2:(a + 1) * n2]))
    vr = [sl(re, a) for a in range(n1)]
    vi = [sl(im, a) for a in range(n1)]
    ys_r, ys_i = _tile_dft(vr, vi, -1)       # stage-1 butterflies (VPU)
    outs_r, outs_i = [], []
    for k1 in range(n1):
        orr, oii = cdot(ys_r[k1], ys_i[k1], _fwd_w(planes, mode, k1, n2))
        outs_r.append(orr)
        outs_i.append(oii)
    if n1 == 1:
        return outs_r[0], outs_i[0]
    return jnp.concatenate(outs_r, axis=1), jnp.concatenate(outs_i, axis=1)


def _ifft_minor_perm(re, im, static, planes, tin: bool = False):
    """Inverse DFT: digit-permuted in, natural out, row-major result.
    Conjugation and 1/n are folded into the constants; ``tin`` as above."""
    n1, n2, mode = static
    cdot = _make_cdot(mode, tin)
    sl = ((lambda t, k: t[k * n2:(k + 1) * n2, :]) if tin
          else (lambda t, k: t[:, k * n2:(k + 1) * n2]))
    ur, ui = [], []
    for k1 in range(n1):
        xr = sl(re, k1)
        xi = sl(im, k1)
        urr, uii = cdot(xr, xi, _inv_w(planes, mode, k1, n2))
        ur.append(urr)
        ui.append(uii)
    # stage-1 butterflies: inverse small DFT over k1 (1/n folded into the
    # stage-2 matrices)
    outs_r, outs_i = _tile_dft(ur, ui, +1)
    if n1 == 1:
        return outs_r[0], outs_i[0]
    return jnp.concatenate(outs_r, axis=1), jnp.concatenate(outs_i, axis=1)


def _make_const_inputs(n: int):
    mode = _dot_mode()
    n1, n2, planes = _dft_consts(n, mode)
    return ((n1, n2, mode), [jnp.asarray(a) for a in planes])


def _const_specs(pl, pltpu, n1, n2, n_planes):
    full = lambda shape: pl.BlockSpec(shape, lambda p, i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return [full((n1 * n2, n2))] * n_planes


# --- kernel bodies -----------------------------------------------------------


def _kernel_a(mode, static_consts, pre_t: bool = True):
    """Row-work kernel: optional IFFT_y, transmit, optional FFT_y.

    ``pre_t``: the transmission arrives as precomputed (cos, sin) planes —
    computing them in-kernel costs ~53 us of VPU transcendentals per 1024^2
    step, repeated for EVERY probe, while the planes are shared across the
    probe batch and cost one extra 4 MB pipelined read. ``pre_t=False``
    streams a single sigma*V plane and takes the cos/sin inside the kernel
    instead — slower per probe, but HALF the per-frame HBM footprint of
    the transmission data (the capacity fallback for very deep stacks,
    PRECOMPUTE_T_MAX_BYTES)."""

    def body(*args):
        if pre_t:
            tr_ref, ti_ref, vr_ref, vi_ref, *rest = args
        else:
            sv_ref, vr_ref, vi_ref, *rest = args
        *const_refs, or_ref, oi_ref = rest
        planes = [r[:] for r in const_refs]
        if mode in ("mid", "last"):
            # Incoming state is y-major: the block is the orthogonal
            # (ny, bx) read; the tin inverse consumes it column-major via
            # lhs-transposed MXU contractions (no transpose ops anywhere).
            re, im = _ifft_minor_perm(vr_ref[0], vi_ref[0], static_consts,
                                      planes, tin=True)
        else:
            re = vr_ref[0]
            im = vi_ref[0]
        if pre_t:
            re, im = _cmul(re, im, tr_ref[:], ti_ref[:])
        else:
            phase = sv_ref[:]
            re, im = _cmul(re, im, jnp.cos(phase), jnp.sin(phase))
        if mode in ("first", "mid"):          # hand off to the column pass
            re, im = _fft_minor_perm(re, im, static_consts, planes)
        or_ref[0] = re                        # natural (x-major) store
        oi_ref[0] = im
    return body


def _kernel_b(static_consts):
    """Column-work kernel: FFT_x, Fresnel multiply (pre-permuted), IFFT_x."""

    def body(vr_ref, vi_ref, pr_ref, pi_ref, *rest):
        *const_refs, or_ref, oi_ref = rest
        planes = [r[:] for r in const_refs]
        # x-major in: orthogonal (nx, by) block, consumed column-major.
        re, im = _fft_minor_perm(vr_ref[0], vi_ref[0], static_consts,
                                 planes, tin=True)
        re, im = _cmul(re, im, pr_ref[:], pi_ref[:])
        re, im = _ifft_minor_perm(re, im, static_consts, planes)
        or_ref[0] = re                        # natural (y-major) store
        oi_ref[0] = im
    return body


def _kernel_c(static_consts):
    """Final k-conversion kernel: FFT_x only — output is full k-space with
    BOTH axes in digit-permuted order, (ky_perm, kx_perm) y-major."""

    def body(vr_ref, vi_ref, *rest):
        *const_refs, or_ref, oi_ref = rest
        planes = [r[:] for r in const_refs]
        re, im = _fft_minor_perm(vr_ref[0], vi_ref[0], static_consts,
                                 planes, tin=True)
        or_ref[0] = re
        oi_ref[0] = im
    return body


def _call_c(psi_re, psi_im, block_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_probes, nx, ny = psi_re.shape           # x-major input from kernel A
    static_consts, const_arrays = _make_const_inputs(nx)
    n1, n2 = static_consts[0], static_consts[1]
    by = min(block_rows, ny)
    grid = (p_probes, ny // by)

    state_spec = pl.BlockSpec((1, nx, by), lambda p, j: (p, 0, j),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, by, nx), lambda p, j: (p, j, 0),
                            memory_space=pltpu.VMEM)
    body = _kernel_c(static_consts)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[state_spec, state_spec]
                 + _const_specs(pl, pltpu, n1, n2, len(const_arrays)),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((p_probes, ny, nx), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(psi_re, psi_im, *const_arrays)
    return out


# --- pallas_call wrappers ----------------------------------------------------


def _call_a(psi_re, psi_im, t_planes, mode: str, block_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ``t_planes``: (t_re, t_im) precomputed transmission planes, or a
    # 1-tuple (sigma_V,) for in-kernel transcendentals (capacity fallback).
    # Input layout: "first"/"only" take the natural x-major wave; "mid"/
    # "last" take kernel B's y-major output and read column blocks (all ky,
    # bx columns of x), transposed at kernel entry. Output is always
    # x-major (p, nx, ny).
    pre_t = len(t_planes) == 2
    if mode in ("first", "only"):
        p_probes, nx, ny = psi_re.shape
    else:
        p_probes, ny, nx = psi_re.shape
    static_consts, const_arrays = _make_const_inputs(ny)
    n1, n2 = static_consts[0], static_consts[1]
    bx = min(block_rows, nx)
    grid = (p_probes, nx // bx)

    if mode in ("first", "only"):
        state_spec = pl.BlockSpec((1, bx, ny), lambda p, i: (p, i, 0),
                                  memory_space=pltpu.VMEM)
    else:
        state_spec = pl.BlockSpec((1, ny, bx), lambda p, i: (p, 0, i),
                                  memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bx, ny), lambda p, i: (i, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, bx, ny), lambda p, i: (p, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = (p_probes, nx, ny)

    body = _kernel_a(mode, static_consts, pre_t)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[t_spec] * len(t_planes) + [state_spec, state_spec]
                 + _const_specs(pl, pltpu, n1, n2, len(const_arrays)),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*t_planes, psi_re, psi_im, *const_arrays)
    return out


def _call_b(psi_re, psi_im, p_re_t, p_im_t, block_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    p_probes, nx, ny = psi_re.shape           # x-major input from kernel A
    static_consts, const_arrays = _make_const_inputs(nx)
    n1, n2 = static_consts[0], static_consts[1]
    by = min(block_rows, ny)
    grid = (p_probes, ny // by)

    state_spec = pl.BlockSpec((1, nx, by), lambda p, j: (p, 0, j),
                              memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((by, nx), lambda p, j: (j, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, by, nx), lambda p, j: (p, j, 0),
                            memory_space=pltpu.VMEM)

    body = _kernel_b(static_consts)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[state_spec, state_spec, p_spec, p_spec]
                 + _const_specs(pl, pltpu, n1, n2, len(const_arrays)),
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((p_probes, ny, nx), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(psi_re, psi_im, p_re_t, p_im_t, *const_arrays)
    return out


def _block_rows(nx: int, ny: int) -> int:
    """Tile height: bound VMEM (~<= 4MB of state tiles) and divide nx."""
    target = max(1, (1 << 20) // (max(nx, ny) * 4))   # ~1MB per plane tile
    bx = 1
    for cand in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= target and nx % cand == 0:
            bx = cand
            break
    return bx


def record_layers_chain(fn, psi, potential_szy, kxs, kys, sigma, lam, dz,
                        ksq, record_layers, kmax2=None, tantilt=None):
    """Depth recording via segment chaining, shared by all fused kernels.

    Splits the slice stack at each recorded layer and runs ``fn`` per
    segment; every resumed segment is prepended a zero potential slice
    (t = exp(i*sigma*0) = 1) so its first step performs exactly the
    pending Fresnel propagation. Returns (n_layers, n_probes, nx, ny)
    of post-transmission snapshots."""
    layers = tuple(int(l) for l in record_layers)
    zero = jnp.zeros_like(potential_szy[:1])
    snaps = []
    cur = psi
    z = 0
    for li, layer in enumerate(layers):
        seg = potential_szy[z:layer + 1]
        if li > 0:
            seg = jnp.concatenate([zero, seg], axis=0)
        cur = fn(cur, seg, kxs, kys, sigma=sigma, lam=lam, dz=dz, ksq=ksq,
                 kmax2=kmax2, tantilt=tantilt)
        snaps.append(cur)
        z = layer + 1
    return jnp.stack(snaps, axis=0)


def fused_multislice(psi, potential_szy, kxs, kys, *, sigma: float,
                     lam: float, dz: float,
                     record_layers=None, ksq=None,
                     kmax2=None, tantilt=None) -> jnp.ndarray:
    """Fused-Pallas equivalent of physics.propagate.multislice.

    psi: (n_probes, nx, ny) complex64; potential_szy: (nz, nx, ny) float32.
    ``record_layers``: optional strictly-increasing tuple of slice indices
    whose post-transmission wavefunction is snapshotted; the run is split
    into segments, each resumed by prepending a zero potential slice
    (t = exp(i*sigma*0) = 1, so the resumed chain's first step is exactly
    the pending Fresnel propagation). Returns the exit wave, or
    (n_layers, n_probes, nx, ny) when recording.
    """
    if record_layers is not None:
        return record_layers_chain(fused_multislice, psi, potential_szy,
                                   kxs, kys, sigma, lam, dz, ksq,
                                   record_layers, kmax2=kmax2,
                                   tantilt=tantilt)
    n_probes, nx, ny = psi.shape
    nz = potential_szy.shape[0]
    if not (supported_size(nx) and supported_size(ny)):
        raise ValueError(f"unsupported grid {nx}x{ny} for fused path")

    re = jnp.real(psi).astype(jnp.float32)
    im = jnp.imag(psi).astype(jnp.float32)
    tp = _chain_t_planes(sigma, potential_szy)

    # The in-kernel transforms emit digit-permuted frequencies; permute the
    # Fresnel multiplier's axes accordingly (static index gathers — works
    # under jit with traced k axes) and transpose for kernel B's y-major
    # tiles. ``ksq`` (oblique cells) replaces the separable kx^2 + ky^2.
    p_re_t, p_im_t = fresnel_permuted_t(nx, ny, kxs, kys, lam, dz, ksq,
                                        kmax2, tantilt)

    ba = _block_rows(nx, ny)
    bb = _block_rows(ny, nx)

    if nz == 1:
        re2, im2 = _call_a(re, im, tuple(t[0] for t in tp), "only", ba)
        return jax.lax.complex(re2, im2)

    # slice 1: transmit + FFT_y
    re, im = _call_a(re, im, tuple(t[0] for t in tp), "first", ba)

    if nz > 2:
        def body(carry, t_s):
            r, i = carry
            r, i = _call_b(r, i, p_re_t, p_im_t, bb)    # -> x-major
            r, i = _call_a(r, i, t_s, "mid", ba)        # -> y-major
            return (r, i), None
        (re, im), _ = jax.lax.scan(body, (re, im),
                                   tuple(t[1:nz - 1] for t in tp))

    re, im = _call_b(re, im, p_re_t, p_im_t, bb)        # -> x-major
    re, im = _call_a(re, im, tuple(t[nz - 1] for t in tp), "last", ba)
    return jax.lax.complex(re, im)


def unpermute_shift_indices(n: int) -> np.ndarray:
    """idx such that natural-fftshifted[k] = permuted[idx[k]]."""
    perm = digit_perm(n)
    inv = np.empty(n, dtype=np.int32)
    inv[perm] = np.arange(n, dtype=np.int32)
    src = np.fft.ifftshift(np.arange(n))      # fftshift(X)[i] == X[src[i]]
    return inv[src]


def transmission_planes(sigma, potential_szy):
    """t = exp(i sigma V) as (cos, sin) f32 planes, computed ONCE per
    frame — in-kernel cos/sin costs ~53 us of VPU transcendentals per
    1M-pixel step and would repeat for every probe.

    Memory trade (round-2 advisor finding): the (cos, sin) pair is 2x the
    HBM of the raw sigma*V stack (+400 MB at 1024^2 x 100 slices), lowering
    the maximum frame depth that fits. The chain falls back to in-kernel
    transcendentals above PRECOMPUTE_T_MAX_BYTES (_chain_t_planes); the
    resident kernel already does below PRECOMPUTE_T_MIN_PROBES."""
    phase = (jnp.asarray(sigma, jnp.float32)
             * potential_szy.astype(jnp.float32))
    return jnp.cos(phase), jnp.sin(phase)


def fresnel_permuted_t(nx, ny, kxs, kys, lam, dz, ksq=None, kmax2=None,
                       tantilt=None):
    """Digit-permuted, transposed Fresnel multiplier planes (ny, nx) —
    the (ky~, kx~) layout every fused kernel's B/propagation stage consumes.
    ``ksq`` (oblique cells) replaces the separable kx^2 + ky^2. ``kmax2``
    (antialiasing band limit, 1/A^2) zeroes the multiplier outside
    |k|^2 <= kmax2; ``tantilt`` (tan theta_x, tan theta_y) adds the
    tilted-propagator phase — both ride the same precomputed planes,
    free per step."""
    if ksq is not None:
        if tantilt is not None:
            raise ValueError("beam tilt needs an orthogonal cell")
        k2 = jnp.asarray(ksq, jnp.float32)[jnp.asarray(digit_perm(nx))][
            :, jnp.asarray(digit_perm(ny))]
        pp = (-np.pi * lam * dz) * k2
    else:
        kxp = jnp.asarray(kxs, jnp.float32)[jnp.asarray(digit_perm(nx))]
        kyp = jnp.asarray(kys, jnp.float32)[jnp.asarray(digit_perm(ny))]
        k2 = kxp[:, None] ** 2 + kyp[None, :] ** 2
        pp = (-np.pi * lam * dz) * k2
        if tantilt is not None:
            pp = pp + (2.0 * np.pi * dz) * (kxp[:, None] * tantilt[0]
                                            + kyp[None, :] * tantilt[1])
    cosp, sinp = jnp.cos(pp), jnp.sin(pp)
    if kmax2 is not None:
        m = (k2 <= kmax2).astype(jnp.float32)
        cosp, sinp = cosp * m, sinp * m
    return cosp.T, sinp.T


def fused_multislice_kspace(psi, potential_szy, kxs, kys, *, sigma: float,
                            lam: float, dz: float, ksq=None,
                            kmax2=None, tantilt=None) -> jnp.ndarray:
    """fftshift(fft2(fused_multislice(...))) with the final transforms fused
    into the kernel chain: the last transmit runs as an A_mid (its FFT_y is
    the conversion's y transform), kernel C adds the x transform, and one
    static gather unpermutes both digit orders and applies the fftshift.
    Returns (n_probes, nx, ny) complex64 k-space exit waves."""
    n_probes, nx, ny = psi.shape
    nz = potential_szy.shape[0]
    if not (supported_size(nx) and supported_size(ny)):
        raise ValueError(f"unsupported grid {nx}x{ny} for fused path")

    re = jnp.real(psi).astype(jnp.float32)
    im = jnp.imag(psi).astype(jnp.float32)
    tp = _chain_t_planes(sigma, potential_szy)

    p_re_t, p_im_t = fresnel_permuted_t(nx, ny, kxs, kys, lam, dz, ksq,
                                        kmax2, tantilt)

    ba = _block_rows(nx, ny)
    bb = _block_rows(ny, nx)

    re, im = _call_a(re, im, tuple(t[0] for t in tp), "first", ba)
    if nz > 2:
        def body(carry, t_s):
            r, i = carry
            r, i = _call_b(r, i, p_re_t, p_im_t, bb)
            r, i = _call_a(r, i, t_s, "mid", ba)
            return (r, i), None
        (re, im), _ = jax.lax.scan(body, (re, im),
                                   tuple(t[1:nz - 1] for t in tp))
    if nz > 1:
        re, im = _call_b(re, im, p_re_t, p_im_t, bb)    # last Fresnel
        re, im = _call_a(re, im, tuple(t[nz - 1] for t in tp), "mid", ba)
    # state: (x, ky~perm) x-major; kernel C adds FFT_x -> (ky~, kx~) y-major
    cr, ci = _call_c(re, im, bb)
    iy = jnp.asarray(unpermute_shift_indices(ny))
    ix = jnp.asarray(unpermute_shift_indices(nx))
    # natural-shifted [p, kx, ky] = permuted [p, iy[ky], ix[kx]]
    k = jax.lax.complex(cr, ci)
    k = jnp.transpose(k[:, iy][:, :, ix], (0, 2, 1))
    return k

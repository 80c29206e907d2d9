"""Fused Pallas multislice step for ODD (non-128-multiple) grids.

Reference-natural grids are int(l/sampling)+1 — generically odd
(/root/reference/src/multislice/potentials.py:123-129) — and the 1024-lane
kernel (ops.fused_step) cannot touch them: its stage-2 structure needs
128-aligned lane slices. This kernel generalizes the same two-pass design to
any composite n = d * m with a SMALL d (the grid's smallest prime factor)
by changing the data layout instead of the slicing rules:

* the minor (lane) axis is stored pre-split in HBM — kernel A reads
  x-stripes of natural-split (R, dx, mx, dy, my) input (or the y-major
  state) and writes the dy-major x-major state (R, dy, dx, mx, my) so that
  kernel B can block one ky1 group at a time; kernel B writes the y-major
  state (R, dx, dy, my, mx). Every in-kernel digit access is a static
  MIDDLE-dim index (always legal in Mosaic), never an unaligned lane slice,
  and every BlockSpec keeps its last two dims FULL (the Pallas TPU lowering
  requires the last two block dims to be (8, 128)-divisible or equal to the
  array dims — m is neither). The layout changes are free: each kernel
  writes the next kernel's preferred layout directly;
* in-kernel data lives as LISTS of (rows, m) tiles, one per digit. The
  four-step stages map onto them directly: stage 1 is the shared tile DFT
  (radix-2 butterflies when d is even, dense unroll otherwise — VPU),
  stage 2 is one (rows, m) @ (m, m) MXU dot per digit with the twiddles
  folded in (per-k1 matrices, as in fused_step);
* layout changes ride the dots: tin-style lhs-transposed contractions
  ('nr,nc->rc') consume the producer's orthogonal block column-major and
  emit the flipped orientation — no transpose ops anywhere (Mosaic compiles
  those for hours, see fused_step docstring);
* k-space stays digit-scrambled between kernels (matfft.scramble_perm
  ordering); the Fresnel multiplier is pre-scrambled AND pre-transposed to
  (dy, my, dx, mx) so kernel B multiplies its (my, mx) tiles directly.

Kernel chain per slice (identical roles to fused_step):

    A_first :  transmit, FFT_y          natural -> x-major (grid: R x dx)
    B       :  FFT_x, * P, IFFT_x       x-major -> y-major (grid: R x dy)
    A_mid   :  IFFT_y, transmit, FFT_y  y-major -> x-major
    A_last  :  IFFT_y, transmit         y-major -> natural exit wave

Eligibility: both axes composite with a divisor split d <= 16 and
m = n/d >= 128 — or m >= 64 when the multi-probe cost model actively picks
a balanced split (round 4: d=11/m=93 beats d=3/m=341 at 1023^2 x 16 probes,
5,227 vs 4,494 slice-steps/s, because the dense (m, m) stage-2 dot pads to
128-multiples: 432 vs 176 MXU slots/point — matfft._fused_split_cost).
Stage-2 dots use the same PYSLICE_FUSED_DOT strategy as fused_step (bf16x3
hi/lo split by default).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import matfft
from .fused_step import (_dot_mode, _make_cdot, _split_hi_lo,
                         _tile_dft, transmission_planes)

MAX_D = 8      # legacy alias (pre-round-4 gate); see supported_size_odd


def supported_size_odd(n: int, n_probes: int = None) -> bool:
    from . import config
    d, m = matfft.scrambled_factors(n, n_probes)
    # Block VMEM ~ 5 * (n * m) f32 planes + stage-2 constants
    # (n * m * 4B * n_planes; bf16x3 mode = 12 planes): cap ~60 MB.
    footprint = n * m * 4 * (5 + 12)
    # m >= 128 is the measured default gate (below it the XLA scrambled
    # path is fine); two ways below it: an explicit PYSLICE_SCRAMBLED_D
    # override (measurement runs, m >= 31), or the multi-probe cost model
    # ACTIVELY choosing a smaller-m split over the smallest-prime default
    # (round 4: d=11/m=93 at 1023 x 16 probes, 5,227 vs 4,494
    # slice-steps/s — matfft._fused_split_cost).
    if config.scrambled_d:
        min_m = 31
    elif (n_probes is not None and n_probes >= 2
          and d != matfft.scrambled_factors(n)[0]):
        min_m = 64
    else:
        min_m = 128
    return 1 < d <= 16 and m >= min_m and footprint < 60 * 1024 * 1024


def _axis_consts(n: int, mode: str, n_probes: int = None):
    """(d, m, planes) for one axis.

    planes: stacked (d*m, m) stage-2 matrices with twiddles folded per k1
    (fwd re/im, inv re/im; + lo parts in bf16x3 mode), exactly the
    fused_step._dft_consts construction generalized from n2=128 to n2=m.
    ``n_probes`` selects the (d, m) split (multi-probe chains use the
    measured cost model — matfft.scrambled_factors).
    """
    d, m = matfft.scrambled_factors(n, n_probes)
    a1 = np.arange(d)
    a2 = np.arange(m)
    w1 = np.exp(-2j * np.pi * np.outer(a1, a1) / d)
    w2 = np.exp(-2j * np.pi * np.outer(a2, a2) / m)
    tw = np.exp(-2j * np.pi * np.outer(a1, a2) / n)
    fwd = np.concatenate([tw[k1][:, None] * w2 for k1 in range(d)], axis=0)
    inv = np.concatenate([np.conj(w2) * np.conj(tw[k1])[None, :]
                          for k1 in range(d)], axis=0)
    del w1     # stage 1 derives its butterfly twiddles in _tile_dft
    inv = inv / n          # 1/n lives in stage 2; stage 1 is pure butterflies
    raw = [fwd.real, fwd.imag, fwd.real + fwd.imag,
           inv.real, inv.imag, inv.real + inv.imag]
    if mode == "bf16x3":
        planes = ([_split_hi_lo(r)[0] for r in raw]
                  + [_split_hi_lo(r)[1] for r in raw])
    else:
        planes = [r.astype(np.float32) for r in raw]
    return d, m, planes


def _w_sel(planes, mode, k1, m, inverse: bool):
    """Per-k1 stage-2 matrix tuple (re, im, sum[, lo...]) for _make_cdot."""
    s = slice(k1 * m, (k1 + 1) * m)
    base = 3 if inverse else 0
    if mode == "bf16x3":
        return (planes[base][s], planes[base + 1][s], planes[base + 2][s],
                planes[base + 6][s], planes[base + 7][s],
                planes[base + 8][s])
    return (planes[base][s], planes[base + 1][s], planes[base + 2][s])


def _fft_tiles(tiles_r, tiles_i, ax, dotmode, tin: bool):
    """Forward DFT over digit tiles: natural digit groups in, k1 groups out.
    ``tin`` uses the lhs-transposed dot (flips tile orientation)."""
    d, m, planes = ax
    cdot = _make_cdot(dotmode, tin)
    ys_r, ys_i = _tile_dft(tiles_r, tiles_i, -1)
    outs_r, outs_i = [], []
    for k1 in range(d):
        zr, zi = cdot(ys_r[k1], ys_i[k1],
                      _w_sel(planes, dotmode, k1, m, inverse=False))
        outs_r.append(zr)
        outs_i.append(zi)
    return outs_r, outs_i


def _ifft_tiles(tiles_r, tiles_i, ax, dotmode, tin: bool):
    """Inverse DFT over digit tiles: k1 groups in, natural groups out."""
    d, m, planes = ax
    cdot = _make_cdot(dotmode, tin)
    us_r, us_i = [], []
    for k1 in range(d):
        ur, ui = cdot(tiles_r[k1], tiles_i[k1],
                      _w_sel(planes, dotmode, k1, m, inverse=True))
        us_r.append(ur)
        us_i.append(ui)
    return _tile_dft(us_r, us_i, +1)


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


# --- kernel bodies -------------------------------------------------------------


def _kernel_a(mode, ax_y, dotmode, n_const):
    """Row-work kernel over one x-stripe (the mx natural-contiguous x values
    of x-digit i; grid (R, dx)).

    Input:  'first'/'only': natural-split (1, 1, mx, dy, my) psi block.
            'mid'/'last':   y-major (1, 1, dy, my, mx) block from kernel B.
    Output: 'first'/'mid': dy-major x-major (1, dy, 1, mx, my) for kernel B;
            'last'/'only': natural-split (1, 1, mx, dy, my) exit block.
    """
    dy = ax_y[0]

    def body(trf_ref, tif_ref, vr_ref, vi_ref, *rest):
        or_ref, oi_ref = rest[n_const:]
        # Bind the stage-2 constant PLANES from the passed refs (the host
        # copies inside ax_y must not be captured by the kernel).
        ax_local = ax_y[:2] + ([r[:] for r in rest[:n_const]],)
        if mode in ("mid", "last"):
            # z[k1] tiles (my, mx): IFFT_y stage-2 tin-dot flips to (mx, my)
            zr = [vr_ref[0, 0, k1, :, :] for k1 in range(dy)]
            zi = [vi_ref[0, 0, k1, :, :] for k1 in range(dy)]
            tr, ti = _ifft_tiles(zr, zi, ax_local, dotmode, tin=True)
        else:
            tr = [vr_ref[0, 0, :, a, :] for a in range(dy)]
            ti = [vi_ref[0, 0, :, a, :] for a in range(dy)]
        # transmit: t = exp(i sigma V) precomputed per frame (stripe layout
        # (1, mx, dy, my)) — in-kernel cos/sin would re-evaluate ~50 us of
        # VPU transcendentals per 1M-pixel step for EVERY probe.
        for a in range(dy):
            tr[a], ti[a] = _cmul(tr[a], ti[a], trf_ref[0, :, a, :],
                                 tif_ref[0, :, a, :])
        if mode in ("first", "mid"):
            tr, ti = _fft_tiles(tr, ti, ax_local, dotmode, tin=False)
            for a in range(dy):
                or_ref[0, a, 0, :, :] = tr[a]     # dy-major for kernel B
                oi_ref[0, a, 0, :, :] = ti[a]
        else:
            for a in range(dy):
                or_ref[0, 0, :, a, :] = tr[a]     # natural exit layout
                oi_ref[0, 0, :, a, :] = ti[a]
    return body


def _kernel_b(ax_x, dotmode, n_const):
    """Column-work kernel over one (probe, ky1 group) (grid (R, dy)).

    Input: dy-major x-major (1, 1, dx, mx, my) block -> (dx, mx, my). FFT_x
    over the (mx, my) x-digit tiles (tin: flip to (my, mx)), Fresnel
    multiply against the pre-scrambled P block (1, my, dx, mx), IFFT_x back
    to natural x digits. Output: y-major (1, dx, 1, my, mx).
    """
    dx = ax_x[0]

    def body(vr_ref, vi_ref, pr_ref, pi_ref, *rest):
        or_ref, oi_ref = rest[n_const:]
        ax_local = ax_x[:2] + ([r[:] for r in rest[:n_const]],)
        vr = [vr_ref[0, 0, a, :, :] for a in range(dx)]
        vi = [vi_ref[0, 0, a, :, :] for a in range(dx)]
        zr, zi = _fft_tiles(vr, vi, ax_local, dotmode, tin=True)
        for k1 in range(dx):
            zr[k1], zi[k1] = _cmul(zr[k1], zi[k1],
                                   pr_ref[0, :, k1, :],
                                   pi_ref[0, :, k1, :])
        ur, ui = _ifft_tiles(zr, zi, ax_local, dotmode, tin=False)
        for a in range(dx):
            or_ref[0, a, 0, :, :] = ur[a]
            oi_ref[0, a, 0, :, :] = ui[a]
    return body


# --- pallas_call wrappers --------------------------------------------------------


def _vmem_params(pltpu):
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _call_a(re, im, t_re_s, t_im_s, mode, ax_y, dims, dotmode, consts_y):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, dx, mx, dy, my = dims
    n_const = len(consts_y)
    grid = (R, dx)

    if mode in ("first", "only"):
        state_spec = pl.BlockSpec((1, 1, mx, dy, my),
                                  lambda p, i: (p, i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        state_spec = pl.BlockSpec((1, 1, dy, my, mx),
                                  lambda p, i: (p, i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, mx, dy, my), lambda p, i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dm, m = consts_y[0].shape
    const_spec = pl.BlockSpec((dm, m), lambda p, i: (0, 0),
                              memory_space=pltpu.VMEM)
    if mode in ("first", "mid"):
        # dy-major x-major output, ready for kernel B's (p, j) blocks
        out_spec = pl.BlockSpec((1, dy, 1, mx, my),
                                lambda p, i: (p, 0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (R, dy, dx, mx, my)
    else:
        out_spec = pl.BlockSpec((1, 1, mx, dy, my),
                                lambda p, i: (p, i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (R, dx, mx, dy, my)

    body = _kernel_a(mode, ax_y, dotmode, n_const)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[v_spec, v_spec, state_spec, state_spec]
                 + [const_spec] * n_const,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)] * 2,
        compiler_params=_vmem_params(pltpu),
    )(t_re_s, t_im_s, re, im, *consts_y)


def _call_b(re, im, p_re, p_im, ax_x, dims, dotmode, consts_x):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, dx, mx, dy, my = dims
    n_const = len(consts_x)
    grid = (R, dy)

    state_spec = pl.BlockSpec((1, 1, dx, mx, my),
                              lambda p, j: (p, j, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((1, my, dx, mx), lambda p, j: (j, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dm, m = consts_x[0].shape
    const_spec = pl.BlockSpec((dm, m), lambda p, j: (0, 0),
                              memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, dx, 1, my, mx),
                            lambda p, j: (p, 0, j, 0, 0),
                            memory_space=pltpu.VMEM)

    body = _kernel_b(ax_x, dotmode, n_const)
    return pl.pallas_call(
        body,
        grid=grid,
        in_specs=[state_spec, state_spec, p_spec, p_spec]
                 + [const_spec] * n_const,
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((R, dx, dy, my, mx),
                                        jnp.float32)] * 2,
        compiler_params=_vmem_params(pltpu),
    )(re, im, p_re, p_im, *consts_x)


def fused_multislice_odd(psi, potential_szy, kxs, kys, *, sigma: float,
                         lam: float, dz: float, ksq=None, kmax2=None,
                         tantilt=None, record_layers=None) -> jnp.ndarray:
    """Fused-Pallas multislice for composite odd grids; same contract as
    ops.fused_step.fused_multislice (incl. depth recording via segment
    chaining: each resumed segment is prepended a zero potential slice so
    its first step performs exactly the pending Fresnel propagation)."""
    if record_layers is not None:
        from .fused_step import record_layers_chain
        return record_layers_chain(fused_multislice_odd, psi,
                                   potential_szy, kxs, kys, sigma, lam,
                                   dz, ksq, record_layers, kmax2=kmax2,
                                   tantilt=tantilt)
    R, nx, ny = psi.shape
    nz = potential_szy.shape[0]
    if not (supported_size_odd(nx, R) and supported_size_odd(ny, R)):
        raise ValueError(f"unsupported grid {nx}x{ny} for fused odd path")
    dotmode = _dot_mode()
    ax_x = _axis_consts(nx, dotmode, R)
    ax_y = _axis_consts(ny, dotmode, R)
    dx, mx = ax_x[0], ax_x[1]
    dy, my = ax_y[0], ax_y[1]
    dims = (R, dx, mx, dy, my)
    consts_x = [jnp.asarray(a) for a in ax_x[2]]
    consts_y = [jnp.asarray(a) for a in ax_y[2]]

    re = jnp.real(psi).astype(jnp.float32).reshape(R, dx, mx, dy, my)
    im = jnp.imag(psi).astype(jnp.float32).reshape(R, dx, mx, dy, my)
    t_re, t_im = transmission_planes(sigma, potential_szy)
    t_re = t_re.reshape(nz, dx, mx, dy, my)
    t_im = t_im.reshape(nz, dx, mx, dy, my)

    # Pre-scrambled, pre-transposed Fresnel multiplier (dy, my, dx, mx):
    # tile [ky1, :, kx1, :] multiplies kernel B's (my, mx) tiles directly.
    # ``ksq`` (oblique cells) replaces the separable kx^2 + ky^2.
    if ksq is not None:
        if tantilt is not None:
            raise ValueError("beam tilt needs an orthogonal cell")
        k2t = jnp.asarray(ksq, jnp.float32).T[
            jnp.asarray(matfft.scramble_perm(ny, R))][
            :, jnp.asarray(matfft.scramble_perm(nx, R))]
        pp = (-np.pi * lam * dz) * k2t
    else:
        kxp = jnp.asarray(kxs, jnp.float32)[
            jnp.asarray(matfft.scramble_perm(nx, R))]
        kyp = jnp.asarray(kys, jnp.float32)[
            jnp.asarray(matfft.scramble_perm(ny, R))]
        k2t = kyp[:, None] ** 2 + kxp[None, :] ** 2
        pp = (-np.pi * lam * dz) * k2t
        if tantilt is not None:
            pp = pp + (2.0 * np.pi * dz) * (kyp[:, None] * tantilt[1]
                                            + kxp[None, :] * tantilt[0])
    cosp, sinp = jnp.cos(pp), jnp.sin(pp)
    if kmax2 is not None:
        m = (k2t <= kmax2).astype(jnp.float32)
        cosp, sinp = cosp * m, sinp * m
    p_re = cosp.reshape(dy, my, dx, mx)
    p_im = sinp.reshape(dy, my, dx, mx)

    if nz == 1:
        re, im = _call_a(re, im, t_re[0], t_im[0], "only", ax_y, dims,
                         dotmode, consts_y)
        return jax.lax.complex(re, im).reshape(R, nx, ny)

    re, im = _call_a(re, im, t_re[0], t_im[0], "first", ax_y, dims,
                     dotmode, consts_y)

    if nz > 2:
        def bstep(carry, t_s):
            r, i = carry
            r, i = _call_b(r, i, p_re, p_im, ax_x, dims, dotmode, consts_x)
            r, i = _call_a(r, i, t_s[0], t_s[1], "mid", ax_y, dims,
                           dotmode, consts_y)
            return (r, i), None
        (re, im), _ = jax.lax.scan(bstep, (re, im),
                                   (t_re[1:nz - 1], t_im[1:nz - 1]))

    re, im = _call_b(re, im, p_re, p_im, ax_x, dims, dotmode, consts_x)
    re, im = _call_a(re, im, t_re[nz - 1], t_im[nz - 1], "last", ax_y,
                     dims, dotmode, consts_y)
    return jax.lax.complex(re, im).reshape(R, nx, ny)

"""Fused Pallas backward pass for the multislice adjoint.

The O(1)-memory adjoint (physics/adjoint.py) runs one stacked chain

    u_z = fft2(P * ifft2(t_{z+1} * u_{z+1})),   u = [conj(a), lam]

backwards through the slice stack, emitting the potential cotangent
``Vbar_z = sum_b Re(i sigma lam_z a_z)`` per slice. Conjugating turns the
recurrence into a STANDARD multislice step on ``w = conj(u) = [a,
conj(lam)]`` with the conjugate transmission (t -> conj(t), i.e. -sigma V)
and the conjugate propagator (P -> conj(P), i.e. dz -> -dz):

    w_z = ifft2(conj(P) * fft2(conj(t_{z+1}) * w_{z+1}))

so the two-pass fused chain of ops/fused_step.py applies verbatim: kernel
B is reused bit-for-bit with a negated propagator sin plane, the entry
kernel A("first") with a negated transmission sin plane. The one new piece
is the A("mid"/"last") variant below: between the IFFT_y and the next
transmit it holds the REAL-SPACE pair (w0, w1) = (a_z, conj(lam_z)) in
VMEM — exactly where the cotangent plane

    Vbar_z = -sigma * sum_pairs Im(conj(w1) * w0)
           = -sigma * sum_pairs (w1_re * w0_im - w1_im * w0_re)

is a free VPU product — and accumulates it across the probe-pair grid
dimension into an (nx, ny) output block (grid order (i, p): the pair axis
is MINOR, so every revisit of a Vbar block is consecutive, the layout TPU
Pallas requires for output accumulation).

Cost per backward slice-step: 2 HBM passes over the doubled (2 n_probes)
state — the same passes/stream structure as the forward chain — plus the
transmission/propagator plane reads; the cotangent accumulation adds no
HBM traffic. Compare the XLA lax.scan backward: ~6 passes and separate
vbar reductions (measured 4-5x slower end-to-end, BENCHMARKS.md).

Used by physics/adjoint.py whenever a forward fused chain would be
eligible for the shape (TPU, float32): 128-divisible axes take the
aligned kernels here, composite odd axes the digit-split variants below
(``fused_adjoint_chain_odd`` — same conjugation trick on
ops/fused_step_odd's kernels, with the pair-packed A-variant's Vbar tiles
laid out in the natural-split (dx, mx, dy, my) stripe order); all other
cases keep the XLA backward scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .fused_step import (_block_rows, _call_a, _call_b, _chain_t_planes,
                         _cmul, _const_specs, _fft_minor_perm,
                         _ifft_minor_perm, _make_const_inputs,
                         fresnel_permuted_t, supported_size)


def adjoint_supported(nx: int, ny: int) -> bool:
    return supported_size(nx) and supported_size(ny)


def _kernel_a_bwd(sigma: float, static_consts, pre_t: bool, last: bool):
    """Pair-packed A-kernel: IFFT_y -> cotangent accumulate -> (transmit +
    FFT_y | store real space).

    Block carries BOTH members of one (a, conj(lam)) pair; the cotangent
    product pairs them elementwise in real space and accumulates over the
    pair grid axis (minor) into the Vbar output block.
    """
    from jax.experimental import pallas as pl

    def body(*args):
        if last:
            vr_ref, vi_ref, *rest = args
            tr_ref = ti_ref = sv_ref = None
        elif pre_t:
            tr_ref, ti_ref, vr_ref, vi_ref, *rest = args
        else:
            sv_ref, vr_ref, vi_ref, *rest = args
        *const_refs, or_ref, oi_ref, vb_ref = rest
        planes = [r[:] for r in const_refs]

        re0, im0 = _ifft_minor_perm(vr_ref[0], vi_ref[0], static_consts,
                                    planes, tin=True)
        re1, im1 = _ifft_minor_perm(vr_ref[1], vi_ref[1], static_consts,
                                    planes, tin=True)

        # Vbar_z tile: -sigma * Im(conj(w1) * w0); sigma is static, folded
        # into the product at trace time.
        contrib = (-sigma) * (re1 * im0 - im1 * re0)

        @pl.when(pl.program_id(1) == 0)
        def _init():
            vb_ref[...] = contrib

        @pl.when(pl.program_id(1) != 0)
        def _acc():
            vb_ref[...] += contrib

        if last:
            or_ref[0], oi_ref[0] = re0, im0
            or_ref[1], oi_ref[1] = re1, im1
            return
        if pre_t:
            tr, ti = tr_ref[:], ti_ref[:]
        else:
            phase = sv_ref[:]
            tr, ti = jnp.cos(phase), jnp.sin(phase)
        re0, im0 = _cmul(re0, im0, tr, ti)
        re1, im1 = _cmul(re1, im1, tr, ti)
        re0, im0 = _fft_minor_perm(re0, im0, static_consts, planes)
        re1, im1 = _fft_minor_perm(re1, im1, static_consts, planes)
        or_ref[0], oi_ref[0] = re0, im0
        or_ref[1], oi_ref[1] = re1, im1

    return body


def _call_a_bwd(psi_re, psi_im, t_planes, sigma: float, block_rows: int,
                last: bool):
    """Pair-packed A-kernel dispatch. State arrives y-major (2 n_pairs,
    ny, nx) from kernel B; returns x-major state (or real-space state for
    ``last``) plus the accumulated (nx, ny) Vbar plane."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    two_np, ny, nx = psi_re.shape
    n_pairs = two_np // 2
    static_consts, const_arrays = _make_const_inputs(ny)
    n1, n2 = static_consts[0], static_consts[1]
    bx = min(block_rows, nx)
    # (i, p): pair axis MINOR so Vbar block revisits are consecutive.
    grid = (nx // bx, n_pairs)

    state_spec = pl.BlockSpec((2, ny, bx), lambda i, p: (p, 0, i),
                              memory_space=pltpu.VMEM)
    t_spec = pl.BlockSpec((bx, ny), lambda i, p: (i, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2, bx, ny), lambda i, p: (p, i, 0),
                            memory_space=pltpu.VMEM)
    vb_spec = pl.BlockSpec((bx, ny), lambda i, p: (i, 0),
                           memory_space=pltpu.VMEM)

    pre_t = (t_planes is not None) and len(t_planes) == 2
    body = _kernel_a_bwd(sigma, static_consts, pre_t, last)
    t_in = () if last else tuple(t_planes)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[t_spec] * len(t_in) + [state_spec, state_spec]
                 + _const_specs(pl, pltpu, n1, n2, len(const_arrays)),
        out_specs=[out_spec, out_spec, vb_spec],
        out_shape=[jax.ShapeDtypeStruct((two_np, nx, ny), jnp.float32),
                   jax.ShapeDtypeStruct((two_np, nx, ny), jnp.float32),
                   jax.ShapeDtypeStruct((nx, ny), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*t_in, psi_re, psi_im, *const_arrays)
    return out


def _pair_block(nx: int, ny: int) -> int:
    """Half the forward tile height (the pair block doubles VMEM) — but
    only where the halved tile still satisfies Mosaic's last-dim rule
    (divisible by 128, or the full axis). Small grids keep the full tile
    (their VMEM footprint is tiny anyway)."""
    ba = _block_rows(nx, ny)
    half = ba // 2
    if half > 0 and (half % 128 == 0 or half == nx):
        return half
    return ba


def fused_adjoint_chain(a_exit, lam_ct, potential_szy, kxs, kys, *,
                        sigma: float, lam: float, dz: float,
                        ksq=None,
                        tantilt: Optional[Tuple[float, float]] = None):
    """Run the full backward chain on the fused kernels.

    Args:
        a_exit: (n_probes, nx, ny) complex64 exit wave (the forward primal
            output — ``a_{nz-1}``).
        lam_ct: (n_probes, nx, ny) complex64 exit-wave cotangent.
        potential_szy: (nz, nx, ny) float32 FORWARD-ordered potential.
        sigma/lam/dz/ksq/tantilt: as the forward chain.

    Returns ``(lam0, vbar_chain)``: the entrance cotangent BEFORE the
    slice-0 transmission (``lam_0``, (n_probes, nx, ny) complex64 — the
    caller applies psibar = t_0 * lam_0) and the potential cotangent
    planes for z = 0 .. nz-2 in slice order ((nz-1, nx, ny) float32; the
    caller appends Vbar_{nz-1} computed from the exit pair). Requires
    nz >= 2.
    """
    n_probes, nx, ny = a_exit.shape
    nz = potential_szy.shape[0]
    if nz < 2:
        raise ValueError("fused_adjoint_chain needs nz >= 2")

    # interleave pairs: rows (2b, 2b+1) = (a_b, conj(lam_b))
    w = jnp.stack([a_exit, jnp.conj(lam_ct)], axis=1)
    w = w.reshape(2 * n_probes, nx, ny)
    re = jnp.real(w).astype(jnp.float32)
    im = jnp.imag(w).astype(jnp.float32)

    pot_rev = potential_szy[1:][::-1]          # V_{nz-1} .. V_1
    tp = _chain_t_planes(sigma, pot_rev)
    # conj(t): negate the sin plane (precomputed) or the phase (in-kernel)
    tp = (tp[0], -tp[1]) if len(tp) == 2 else (-tp[0],)
    pc_re_t, pc_im_t = fresnel_permuted_t(nx, ny, kxs, kys, lam, dz, ksq,
                                          None, tantilt)
    pc_im_t = -pc_im_t                         # conj(P)

    ba = _block_rows(nx, ny)
    bb = _block_rows(ny, nx)
    bp = _pair_block(nx, ny)

    # entry: transmit conj(t_{nz-1}) + FFT_y (flat batch, forward kernel)
    re, im = _call_a(re, im, tuple(t[0] for t in tp), "first", ba)

    vbs_scan = None
    if nz > 2:
        def body(carry, t_s):
            r, i = carry
            r, i = _call_b(r, i, pc_re_t, pc_im_t, bb)
            r, i, vb = _call_a_bwd(r, i, t_s, sigma, bp, last=False)
            return (r, i), vb
        (re, im), vbs_scan = jax.lax.scan(
            body, (re, im), tuple(t[1:nz - 1] for t in tp))

    re, im = _call_b(re, im, pc_re_t, pc_im_t, bb)
    re, im, vb0 = _call_a_bwd(re, im, None, sigma, bp, last=True)

    # chain order: scan emitted Vbar_{nz-2} .. Vbar_1; prepend Vbar_0
    if vbs_scan is not None:
        vbar = jnp.concatenate([vb0[None], vbs_scan[::-1]], axis=0)
    else:
        vbar = vb0[None]

    w0 = jax.lax.complex(re, im).reshape(n_probes, 2, nx, ny)
    lam0 = jnp.conj(w0[:, 1])
    return lam0, vbar


# --- composite-odd-grid backward (digit-split kernels) -----------------------


def adjoint_supported_odd(nx: int, ny: int, n_probes: int = None) -> bool:
    from .fused_step_odd import supported_size_odd
    return (supported_size_odd(nx, n_probes)
            and supported_size_odd(ny, n_probes))


def _kernel_a_bwd_odd(sigma: float, mode: str, ax_y, dotmode, n_const):
    """Pair-packed digit-split A-kernel: IFFT_y tiles -> cotangent
    accumulate -> (transmit + FFT_y | natural store). Mirrors
    fused_step_odd._kernel_a's 'mid'/'last' modes for the (a, conj(lam))
    pair; the Vbar output accumulates over the minor pair-grid axis."""
    from jax.experimental import pallas as pl
    from .fused_step_odd import _cmul as _cmul_odd  # noqa: F401
    from .fused_step_odd import _fft_tiles, _ifft_tiles

    dy = ax_y[0]

    def body(*args):
        if mode == "mid":
            trf_ref, tif_ref, vr_ref, vi_ref, *rest = args
        else:
            vr_ref, vi_ref, *rest = args
        or_ref, oi_ref, vb_ref = rest[n_const:]
        ax_local = ax_y[:2] + ([r[:] for r in rest[:n_const]],)

        outs = []
        for c in (0, 1):
            zr = [vr_ref[c, 0, k1, :, :] for k1 in range(dy)]
            zi = [vi_ref[c, 0, k1, :, :] for k1 in range(dy)]
            outs.append(_ifft_tiles(zr, zi, ax_local, dotmode, tin=True))
        (r0, i0), (r1, i1) = outs

        for a in range(dy):
            contrib = (-sigma) * (r1[a] * i0[a] - i1[a] * r0[a])

            @pl.when(pl.program_id(1) == 0)
            def _init(a=a, contrib=contrib):
                vb_ref[0, :, a, :] = contrib

            @pl.when(pl.program_id(1) != 0)
            def _acc(a=a, contrib=contrib):
                vb_ref[0, :, a, :] += contrib

        if mode == "last":
            for c, (tr, ti) in enumerate(((r0, i0), (r1, i1))):
                for a in range(dy):
                    or_ref[c, 0, :, a, :] = tr[a]
                    oi_ref[c, 0, :, a, :] = ti[a]
            return
        from .fused_step import _cmul
        for c, (tr, ti) in enumerate(((r0, i0), (r1, i1))):
            for a in range(dy):
                tr[a], ti[a] = _cmul(tr[a], ti[a], trf_ref[0, :, a, :],
                                     tif_ref[0, :, a, :])
            tr, ti = _fft_tiles(tr, ti, ax_local, dotmode, tin=False)
            for a in range(dy):
                or_ref[c, a, 0, :, :] = tr[a]
                oi_ref[c, a, 0, :, :] = ti[a]

    return body


def _call_a_bwd_odd(re, im, t_planes, sigma: float, mode: str, ax_y, dims,
                    dotmode, consts_y):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    two_np, dx, mx, dy, my = dims[0] * 2, dims[1], dims[2], dims[3], dims[4]
    n_pairs = dims[0]
    n_const = len(consts_y)
    # pair axis MINOR: Vbar block revisits are consecutive
    grid = (dx, n_pairs)

    state_spec = pl.BlockSpec((2, 1, dy, my, mx),
                              lambda i, p: (p, i, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, mx, dy, my), lambda i, p: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dm, m = consts_y[0].shape
    const_spec = pl.BlockSpec((dm, m), lambda i, p: (0, 0),
                              memory_space=pltpu.VMEM)
    vb_spec = pl.BlockSpec((1, mx, dy, my), lambda i, p: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    if mode == "mid":
        out_spec = pl.BlockSpec((2, dy, 1, mx, my),
                                lambda i, p: (p, 0, i, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (two_np, dy, dx, mx, my)
    else:
        out_spec = pl.BlockSpec((2, 1, mx, dy, my),
                                lambda i, p: (p, i, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = (two_np, dx, mx, dy, my)

    body = _kernel_a_bwd_odd(sigma, mode, ax_y, dotmode, n_const)
    t_in = () if mode == "last" else tuple(t_planes)
    in_specs = ([v_spec] * len(t_in) + [state_spec, state_spec]
                + [const_spec] * n_const)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, vb_spec],
        out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32),
                   jax.ShapeDtypeStruct(out_shape, jnp.float32),
                   jax.ShapeDtypeStruct((dx, mx, dy, my), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*t_in, re, im, *consts_y)
    return out


def fused_adjoint_chain_odd(a_exit, lam_ct, potential_szy, kxs, kys, *,
                            sigma: float, lam: float, dz: float,
                            ksq=None,
                            tantilt: Optional[Tuple[float, float]] = None):
    """Composite-odd-grid fused backward chain; same contract as
    ``fused_adjoint_chain``. Reuses fused_step_odd's entry kernel and
    kernel B verbatim with negated sin planes (conj(t), conj(P))."""
    from . import matfft
    from .fused_step_odd import (_axis_consts, _call_a, _call_b,
                                 transmission_planes)
    from .fused_step import _dot_mode

    n_probes, nx, ny = a_exit.shape
    nz = potential_szy.shape[0]
    if nz < 2:
        raise ValueError("fused_adjoint_chain_odd needs nz >= 2")

    dotmode = _dot_mode()
    # The pair-packed stream is a 2*n_probes batch: pick the digit split
    # with the same measured cost model the forward chain uses
    # (matfft.scrambled_factors; 1023 -> d=11/m=93 for any batch >= 2).
    R2 = 2 * n_probes
    ax_x = _axis_consts(nx, dotmode, R2)
    ax_y = _axis_consts(ny, dotmode, R2)
    dx, mx = ax_x[0], ax_x[1]
    dy, my = ax_y[0], ax_y[1]
    dims = (n_probes, dx, mx, dy, my)
    dims2 = (2 * n_probes, dx, mx, dy, my)
    consts_x = [jnp.asarray(a) for a in ax_x[2]]
    consts_y = [jnp.asarray(a) for a in ax_y[2]]

    w = jnp.stack([a_exit, jnp.conj(lam_ct)], axis=1)
    w = w.reshape(2 * n_probes, nx, ny)
    re = jnp.real(w).astype(jnp.float32).reshape(2 * n_probes, dx, mx,
                                                 dy, my)
    im = jnp.imag(w).astype(jnp.float32).reshape(2 * n_probes, dx, mx,
                                                 dy, my)

    pot_rev = potential_szy[1:][::-1]
    t_re, t_im = transmission_planes(sigma, pot_rev)
    t_re = t_re.reshape(nz - 1, dx, mx, dy, my)
    t_im = (-t_im).reshape(nz - 1, dx, mx, dy, my)       # conj(t)

    if ksq is not None:
        if tantilt is not None:
            raise ValueError("beam tilt needs an orthogonal cell")
        k2t = jnp.asarray(ksq, jnp.float32).T[
            jnp.asarray(matfft.scramble_perm(ny, R2))][
            :, jnp.asarray(matfft.scramble_perm(nx, R2))]
        pp = (-np.pi * lam * dz) * k2t
    else:
        kxp = jnp.asarray(kxs, jnp.float32)[
            jnp.asarray(matfft.scramble_perm(nx, R2))]
        kyp = jnp.asarray(kys, jnp.float32)[
            jnp.asarray(matfft.scramble_perm(ny, R2))]
        pp = (-np.pi * lam * dz) * (kyp[:, None] ** 2 + kxp[None, :] ** 2)
        if tantilt is not None:
            pp = pp + (2.0 * np.pi * dz) * (kyp[:, None] * tantilt[1]
                                            + kxp[None, :] * tantilt[0])
    p_re = jnp.cos(pp).reshape(dy, my, dx, mx)
    p_im = (-jnp.sin(pp)).reshape(dy, my, dx, mx)        # conj(P)

    re, im = _call_a(re, im, t_re[0], t_im[0], "first", ax_y, dims2,
                     dotmode, consts_y)

    vbs_scan = None
    if nz > 2:
        def bstep(carry, t_s):
            r, i = carry
            r, i = _call_b(r, i, p_re, p_im, ax_x, dims2, dotmode, consts_x)
            r, i, vb = _call_a_bwd_odd(r, i, (t_s[0], t_s[1]), sigma,
                                       "mid", ax_y, dims, dotmode, consts_y)
            return (r, i), vb
        (re, im), vbs_scan = jax.lax.scan(
            bstep, (re, im), (t_re[1:], t_im[1:]))

    re, im = _call_b(re, im, p_re, p_im, ax_x, dims2, dotmode, consts_x)
    re, im, vb0 = _call_a_bwd_odd(re, im, None, sigma, "last", ax_y, dims,
                                  dotmode, consts_y)

    if vbs_scan is not None:
        vbar = jnp.concatenate([vb0[None], vbs_scan[::-1]], axis=0)
    else:
        vbar = vb0[None]
    vbar = vbar.reshape(-1, nx, ny)

    w0 = jax.lax.complex(re, im).reshape(n_probes, 2, nx, ny)
    lam0 = jnp.conj(w0[:, 1])
    return lam0, vbar

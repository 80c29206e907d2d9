"""VMEM-resident fused multislice — the whole slice loop in ONE kernel.

The two-pass kernel chain (ops.fused_step) dispatches ~2 pallas_calls per
slice; a frame is ~28 dispatches whose fixed cost dominates whenever the
per-call work is small (few probes and/or small grids). This kernel runs
the ENTIRE slice loop in a single pallas_call by keeping the wavefunction
in VMEM between slices:

    grid = (n_probes, nz), iterated slice-fastest. The psi state lives in
    VMEM scratch buffers that persist across grid steps (TPU grids are
    sequential); only the potential slice streams from HBM each step
    (auto-pipelined by the BlockSpec fetch), and the Fresnel multiplier +
    DFT constants are fetched once (constant index maps -> revisited
    blocks, single-buffered). Per-probe HBM traffic: read psi once, write
    the exit wave once, stream nz potential slices.

Measured on v5e at 1024^2 x 14 slices: 4.1x the chain at 1 probe
(1.4 ms/frame vs 5.7 — the dispatch-bound regime, e.g. plane-wave TACAW
runs), but 0.8x at 16 probes (24.7 ms vs 19.9 — with large per-call work
the chain's pipelined-HBM grid schedule wins on per-transform time, even
though this kernel moves ~10x less HBM). physics.propagate dispatches on
that crossover (resident_preferred).

Math and layout are identical to ops.fused_step: four-step matmul DFTs
with n = n1 * 128, digit-permuted frequencies end to end, a pre-permuted
transposed Fresnel multiplier, and layout changes expressed as
lhs-transposed MXU contractions (einsum 'nr,nc->rc') — never transpose
ops, which Mosaic compiles pathologically. Per slice the state cycles

    (x, ky)  --FFT_x-->  (ky, kx)  --*P-->  --IFFT_x-->  (ky, x)
             --IFFT_y--> (x, y)    --*t_s-->  --FFT_y-->  (x, ky)

with the first slice entering at (x, y) and the last exiting after the
transmit (skip-last-propagation rule, multislice.py:289), processed in
bx-row / by-column blocks through two scratch planes (state x-major, tmp
y-major). VMEM at 1024^2 (the eligibility cap): 8 MB state + 8 MB tmp +
8 MB in + 8 MB out + 8 MB Fresnel + 4-8 MB potential + 6-15 MB DFT
constants — inside the 100 MB limit the other kernels already run with.

Scope: float32/complex64, both axes divisible by 128, nx * ny <= 2^20,
nz >= 2 (single-slice problems are pure transmission — fused_step handles
them). Depth recording chains segments exactly like fused_step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .fused_step import (
    _block_rows,
    transmission_planes,
    _cmul,
    _fft_minor_perm,
    _ifft_minor_perm,
    _make_const_inputs,
    fresnel_permuted_t,
    supported_size,
    unpermute_shift_indices,
)

# VMEM ceiling: state/in/out/Fresnel planes scale with nx*ny, and the
# bf16x3 DFT constant planes scale with max(nx, ny) (12 planes of
# (n, 128) f32 = 6 KB * n). Past 2^20 pixels or a 2048 axis the working
# set no longer fits the 100 MB limit and the two-pass chain takes over.
MAX_PIXELS = 1 << 20
MAX_AXIS = 2048


def resident_supported(nx: int, ny: int, nz: int) -> bool:
    return (supported_size(nx) and supported_size(ny)
            and nx * ny <= MAX_PIXELS and max(nx, ny) <= MAX_AXIS
            and nz >= 2)


def resident_preferred(n_probes: int, nx: int, ny: int) -> bool:
    """Measured dispatch crossover vs the two-pass chain (v5e, bf16x3).

    The two-pass chain costs ~2 pallas_call dispatches per slice; with
    little per-call work that overhead dominates (1 probe at 1024^2:
    5.7 ms/frame two-pass vs 1.4 ms resident — 4.1x). With enough
    per-call work the chain's pipelined-HBM schedule is ~15-25% faster
    per transform (16 probes at 1024^2: 19.9 ms vs 24.7 ms; 14.7 vs 24.7
    after the shared transmission planes). Crossover: resident below ~3M
    probe-pixels, and always at <= 512^2 grids (16 probes at 512^2 with
    t-planes: resident 64.5k steps/s vs chain 57.1k)."""
    px = nx * ny
    return px <= (1 << 18) or n_probes * px < 3 * (1 << 20)


# Probe count at which precomputing the transmission planes (cos/sin of
# sigma V once per frame in XLA) beats in-kernel transcendentals: the
# precompute is un-overlapped on the critical path (~1.1 ms at 1024^2 x 14),
# the in-kernel cost (~50 us per 1M-pixel step) repeats per probe but
# overlaps the kernel's MXU work. Measured: P=1 is 1.8x faster in-kernel.
PRECOMPUTE_T_MIN_PROBES = 4


def _kernel_resident(nz, nx, ny, bx, by, static_x, static_y, n_cx, n_cy,
                     kspace, pre_t):
    """Body for grid (n_probes, nz). Ref order: psi_re, psi_im, v, P_re,
    P_im, const_x..., const_y..., out_re, out_im, state_re/im, tmp_re/im.

    Per-slice work runs in BLOCKS (bx rows / by columns at a time, the same
    tile heights the two-pass chain uses) through two VMEM scratch planes:
    stage B takes by-column blocks of the (x, ky) state through
    FFT_x / Fresnel / IFFT_x into the y-major tmp plane, stage A takes
    bx-row blocks of tmp through IFFT_y / transmit / FFT_y back into state.
    Block iterations are independent, so Mosaic's scheduler overlaps one
    block's VPU stage-1 butterflies with another's MXU dots — whole-array
    transforms serialized those and ran ~25% slower at 1024^2.
    When nx == ny, n_cy == 0 and the y transforms reuse the x constants."""
    from jax.experimental import pallas as pl

    def body(vr_ref, vi_ref, *refs):
        if pre_t:
            tr_ref, ti_ref, pr_ref, pi_ref, *rest = refs
        else:
            v_ref, pr_ref, pi_ref, *rest = refs
        cx_refs = rest[:n_cx]
        cy_refs = rest[n_cx:n_cx + n_cy] if n_cy else cx_refs
        (or_ref, oi_ref, str_ref, sti_ref,
         tmr_ref, tmi_ref) = rest[n_cx + n_cy:]
        planes_x = [r[:] for r in cx_refs]
        planes_y = ([r[:] for r in cy_refs] if n_cy else planes_x)
        s = pl.program_id(1)

        def transmit(re, im, r):
            # pre_t: t = exp(i sigma V) precomputed per frame; otherwise
            # cos/sin of the sigma-scaled potential stripe in-kernel (the
            # better trade below PRECOMPUTE_T_MIN_PROBES).
            if pre_t:
                return _cmul(re, im, tr_ref[0, r, :], ti_ref[0, r, :])
            phase = v_ref[0, r, :]
            return _cmul(re, im, jnp.cos(phase), jnp.sin(phase))

        def stage_b():
            # state (x, ky) -> tmp (ky, x): FFT_x, * Fresnel, IFFT_x,
            # one by-column block at a time.
            for j in range(ny // by):
                c = slice(j * by, (j + 1) * by)
                re, im = _fft_minor_perm(str_ref[:, c], sti_ref[:, c],
                                         static_x, planes_x,
                                         tin=True)             # (by, kx)
                re, im = _cmul(re, im, pr_ref[c, :], pi_ref[c, :])
                re, im = _ifft_minor_perm(re, im, static_x,
                                          planes_x)            # (by, x)
                tmr_ref[c, :] = re
                tmi_ref[c, :] = im

        @pl.when(s == 0)
        def _first():
            # psi (x, y) -> state (x, ky): transmit + FFT_y by row block.
            for i in range(nx // bx):
                r = slice(i * bx, (i + 1) * bx)
                re, im = transmit(vr_ref[0, r, :], vi_ref[0, r, :], r)
                fr, fi = _fft_minor_perm(re, im, static_y, planes_y)
                str_ref[r, :] = fr
                sti_ref[r, :] = fi

        @pl.when(s > 0)
        def _step():
            stage_b()
            # tmp (ky, x) -> IFFT_y, transmit (+ FFT_y unless last slice).
            for i in range(nx // bx):
                r = slice(i * bx, (i + 1) * bx)
                re, im = _ifft_minor_perm(tmr_ref[:, r], tmi_ref[:, r],
                                          static_y, planes_y,
                                          tin=True)            # (bx, y)
                re, im = transmit(re, im, r)

                @pl.when(s < nz - 1)
                def _mid():
                    fr, fi = _fft_minor_perm(re, im, static_y, planes_y)
                    str_ref[r, :] = fr
                    sti_ref[r, :] = fi

                @pl.when(s == nz - 1)
                def _last():
                    if kspace:
                        # exit conversion: FFT_y back into state; kernel-C
                        # style FFT_x follows below once all rows land.
                        fr, fi = _fft_minor_perm(re, im, static_y, planes_y)
                        str_ref[r, :] = fr
                        sti_ref[r, :] = fi
                    else:
                        or_ref[0, r, :] = re                   # (x, y)
                        oi_ref[0, r, :] = im

            if kspace:
                @pl.when(s == nz - 1)
                def _convert():
                    # state (x, ky) -> out (ky, kx): FFT_x by column block.
                    for j in range(ny // by):
                        c = slice(j * by, (j + 1) * by)
                        re, im = _fft_minor_perm(str_ref[:, c],
                                                 sti_ref[:, c],
                                                 static_x, planes_x,
                                                 tin=True)     # (by, kx)
                        or_ref[0, c, :] = re
                        oi_ref[0, c, :] = im
    return body


def _call_resident(re, im, t_planes, p_re_t, p_im_t, kspace: bool):
    """``t_planes``: (t_re, t_im) precomputed transmission planes, or a
    1-tuple (sigma_V,) for in-kernel transcendentals (small probe
    batches)."""
    pre_t = len(t_planes) == 2
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_probes, nx, ny = re.shape
    nz = t_planes[0].shape[0]
    static_y, consts_y = _make_const_inputs(ny)
    if nx == ny:
        static_x, consts_x = static_y, consts_y
        extra_y = []
        n_cx, n_cy = len(consts_x), 0
    else:
        static_x, consts_x = _make_const_inputs(nx)
        extra_y = consts_y
        n_cx, n_cy = len(consts_x), len(consts_y)

    bx = _block_rows(nx, ny)
    by = _block_rows(ny, nx)
    grid = (n_probes, nz)
    # Blocks that change at most once per probe are single-buffered —
    # double-buffering them (the pipeline default) would burn ~22 MB of
    # VMEM on copies that never overlap a fetch.
    single = pl.Buffered(buffer_count=1)
    psi_spec = pl.BlockSpec((1, nx, ny), lambda p, s: (p, 0, 0),
                            memory_space=pltpu.VMEM, pipeline_mode=single)
    v_spec = pl.BlockSpec((1, nx, ny), lambda p, s: (s, 0, 0),
                          memory_space=pltpu.VMEM)
    p_spec = pl.BlockSpec((ny, nx), lambda p, s: (0, 0),
                          memory_space=pltpu.VMEM, pipeline_mode=single)

    def const_spec(arr):
        return pl.BlockSpec(arr.shape, lambda p, s: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM, pipeline_mode=single)

    out_shape = (n_probes, ny, nx) if kspace else (n_probes, nx, ny)
    out_spec = pl.BlockSpec((1,) + out_shape[1:], lambda p, s: (p, 0, 0),
                            memory_space=pltpu.VMEM)

    body = _kernel_resident(nz, nx, ny, bx, by, static_x, static_y,
                            n_cx, n_cy, kspace, pre_t)
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=[psi_spec, psi_spec]
                 + [v_spec] * len(t_planes)
                 + [p_spec, p_spec]
                 + [const_spec(a) for a in consts_x]
                 + [const_spec(a) for a in extra_y],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct(out_shape, jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((nx, ny), jnp.float32)] * 2
                       + [pltpu.VMEM((ny, nx), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(re, im, *t_planes, p_re_t, p_im_t, *consts_x, *extra_y)
    return out


def _t_planes(n_probes, sigma, potential_szy):
    if n_probes >= PRECOMPUTE_T_MIN_PROBES:
        return transmission_planes(sigma, potential_szy)
    return (jnp.asarray(sigma, jnp.float32)
            * potential_szy.astype(jnp.float32),)


def fused_multislice_resident(psi, potential_szy, kxs, kys, *, sigma: float,
                              lam: float, dz: float, record_layers=None,
                              ksq=None, kmax2=None,
                              tantilt=None) -> jnp.ndarray:
    """VMEM-resident equivalent of fused_step.fused_multislice.

    psi: (n_probes, nx, ny) complex64; potential_szy: (nz, nx, ny) float32.
    Returns the real-space exit wave (skip-last-propagation semantics), or
    (n_layers, n_probes, nx, ny) when ``record_layers`` snapshots depths
    (segment chaining with a zero resume slice — see fused_step).
    """
    if record_layers is not None:
        from .fused_step import record_layers_chain
        return record_layers_chain(fused_multislice_resident, psi,
                                   potential_szy, kxs, kys, sigma, lam,
                                   dz, ksq, record_layers, kmax2=kmax2,
                                   tantilt=tantilt)

    n_probes, nx, ny = psi.shape
    nz = potential_szy.shape[0]
    if nz < 2:
        from .fused_step import fused_multislice
        return fused_multislice(psi, potential_szy, kxs, kys, sigma=sigma,
                                lam=lam, dz=dz, ksq=ksq, kmax2=kmax2,
                                tantilt=tantilt)
    if not resident_supported(nx, ny, nz):
        raise ValueError(f"unsupported grid {nx}x{ny} for resident path")

    re = jnp.real(psi).astype(jnp.float32)
    im = jnp.imag(psi).astype(jnp.float32)
    t_planes = _t_planes(psi.shape[0], sigma, potential_szy)
    p_re_t, p_im_t = fresnel_permuted_t(nx, ny, kxs, kys, lam, dz, ksq,
                                        kmax2, tantilt)
    re2, im2 = _call_resident(re, im, t_planes, p_re_t, p_im_t,
                              kspace=False)
    return jax.lax.complex(re2, im2)


def fused_multislice_kspace_resident(psi, potential_szy, kxs, kys, *,
                                     sigma: float, lam: float, dz: float,
                                     ksq=None, kmax2=None,
                                     tantilt=None) -> jnp.ndarray:
    """fftshift(fft2(fused_multislice_resident(...))) with the conversion
    transforms fused into the same kernel (the kspace last-slice branch);
    one static gather unpermutes both digit orders and applies fftshift."""
    n_probes, nx, ny = psi.shape
    nz = potential_szy.shape[0]
    if nz < 2:
        from .fused_step import fused_multislice_kspace
        return fused_multislice_kspace(psi, potential_szy, kxs, kys,
                                       sigma=sigma, lam=lam, dz=dz,
                                       ksq=ksq, kmax2=kmax2,
                                       tantilt=tantilt)
    if not resident_supported(nx, ny, nz):
        raise ValueError(f"unsupported grid {nx}x{ny} for resident path")

    re = jnp.real(psi).astype(jnp.float32)
    im = jnp.imag(psi).astype(jnp.float32)
    t_planes = _t_planes(psi.shape[0], sigma, potential_szy)
    p_re_t, p_im_t = fresnel_permuted_t(nx, ny, kxs, kys, lam, dz, ksq,
                                        kmax2, tantilt)
    cr, ci = _call_resident(re, im, t_planes, p_re_t, p_im_t,
                            kspace=True)
    iy = jnp.asarray(unpermute_shift_indices(ny))
    ix = jnp.asarray(unpermute_shift_indices(nx))
    k = jax.lax.complex(cr, ci)
    # natural-shifted [p, kx, ky] = permuted [p, iy[ky], ix[kx]]
    return jnp.transpose(k[:, iy][:, :, ix], (0, 2, 1))

"""O(1)-memory multislice adjoint (physics/adjoint.py).

Verifies the hand-written VJP against jax's own autodiff through the XLA
scan path (which stores nz residuals — fine at test sizes), the unitarity
invariant the adjoint relies on, the structural O(1)-residual guarantee,
and the float32 reconstruction-drift bound at realistic depth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyslice_tpu.core.dtypes import DOUBLE, SINGLE
from pyslice_tpu.physics.adjoint import _ms_diff_fwd, multislice_diff
from pyslice_tpu.physics.propagate import multislice

EV = 100e3


def _problem(nb=3, nx=24, ny=20, nz=6, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    cdtype = np.complex128 if dtype == np.float64 else np.complex64
    psi = (rng.normal(size=(nb, nx, ny))
           + 1j * rng.normal(size=(nb, nx, ny))).astype(cdtype)
    # realistic-magnitude potential (V*sigma ~ O(1) phase)
    v = (rng.normal(size=(nz, nx, ny)) * 40.0).astype(dtype)
    kxs = np.fft.fftfreq(nx, d=0.12).astype(dtype)
    kys = np.fft.fftfreq(ny, d=0.15).astype(dtype)
    return psi, v, kxs, kys


def _compare_vjp(kw_diff, kw_ref, psi, v, kxs, kys, prec, tol, seed=7):
    """max-abs error between the custom VJP and autodiff cotangents."""
    f_diff = lambda p, pot: multislice_diff(p, pot, kxs, kys, eV=EV,
                                            precision=prec, **kw_diff)
    f_ref = lambda p, pot: multislice(p, pot, kxs, kys, eV=EV,
                                      precision=prec, fused=False, **kw_ref)
    out_d, vjp_d = jax.vjp(f_diff, psi, v)
    out_r, vjp_r = jax.vjp(f_ref, psi, v)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_r),
                               rtol=0, atol=tol)
    rng = np.random.default_rng(seed)
    g = jnp.asarray((rng.normal(size=out_d.shape)
                     + 1j * rng.normal(size=out_d.shape)),
                    dtype=out_d.dtype)
    pb_d, vb_d = vjp_d(g)
    pb_r, vb_r = vjp_r(g)
    scale = float(jnp.max(jnp.abs(vb_r))) + 1e-30
    err_v = float(jnp.max(jnp.abs(vb_d - vb_r))) / scale
    scale_p = float(jnp.max(jnp.abs(pb_r))) + 1e-30
    err_p = float(jnp.max(jnp.abs(pb_d - pb_r))) / scale_p
    assert err_v < tol, f"potential cotangent rel err {err_v}"
    assert err_p < tol, f"probe cotangent rel err {err_p}"


def test_vjp_matches_autodiff_f64():
    psi, v, kxs, kys = _problem()
    _compare_vjp(dict(dz=0.9), dict(dz=0.9), psi, v, kxs, kys, DOUBLE, 1e-12)


def test_vjp_matches_autodiff_tilt():
    psi, v, kxs, kys = _problem(seed=2)
    _compare_vjp(dict(dz=0.7, tilt=(4.0, -2.5)), dict(dz=0.7, tilt=(4.0, -2.5)),
                 psi, v, kxs, kys, DOUBLE, 1e-12)


def test_vjp_matches_autodiff_oblique():
    psi, v, kxs, kys = _problem(seed=3)
    # a synthetic (positive) oblique metric: k2 with a cross term
    k2 = (kxs[:, None] ** 2 + kys[None, :] ** 2
          + 0.4 * kxs[:, None] * kys[None, :])
    f_diff = lambda p, pot: multislice_diff(p, pot, kxs, kys, eV=EV, dz=0.8,
                                            precision=DOUBLE, ksq=k2)
    f_ref = lambda p, pot: multislice(p, pot, kxs, kys, eV=EV, dz=0.8,
                                      precision=DOUBLE, fused=False, ksq=k2)
    out_d, vjp_d = jax.vjp(f_diff, psi, v)
    out_r, vjp_r = jax.vjp(f_ref, psi, v)
    g = jnp.asarray(np.ones(out_d.shape) * (0.3 - 0.7j), dtype=out_d.dtype)
    for d, r in zip(vjp_d(g), vjp_r(g)):
        np.testing.assert_allclose(np.asarray(d), np.asarray(r), atol=1e-10)


def test_grad_of_intensity_loss():
    """The composition users actually write: jit(grad(loss))."""
    psi, v, kxs, kys = _problem(nz=4, seed=4)
    target = np.abs(np.asarray(jnp.fft.fft2(
        multislice(psi, v, kxs, kys, eV=EV, dz=1.0, precision=DOUBLE,
                   fused=False)))) ** 2

    def loss_diff(pot):
        out = multislice_diff(psi, pot, kxs, kys, eV=EV, dz=1.0,
                              precision=DOUBLE)
        return jnp.mean((jnp.abs(jnp.fft.fft2(out)) ** 2 - target) ** 2)

    def loss_ref(pot):
        out = multislice(psi, pot, kxs, kys, eV=EV, dz=1.0, precision=DOUBLE,
                         fused=False)
        return jnp.mean((jnp.abs(jnp.fft.fft2(out)) ** 2 - target) ** 2)

    v0 = jnp.asarray(v) * 0.9
    g_d = jax.jit(jax.grad(loss_diff))(v0)
    g_r = jax.jit(jax.grad(loss_ref))(v0)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_r),
                               rtol=0, atol=1e-10 * float(jnp.max(jnp.abs(g_r))))


def test_unitarity_gradient_invariant():
    """d/dV sum|psi_exit|^2 == 0 exactly: the chain is norm-preserving for
    ANY potential, so the total-intensity gradient must vanish — the same
    unitarity the O(1) reconstruction rests on."""
    psi, v, kxs, kys = _problem(nz=5, seed=5)

    def norm(pot):
        out = multislice_diff(psi, pot, kxs, kys, eV=EV, dz=1.1,
                              precision=DOUBLE)
        return jnp.sum(jnp.abs(out) ** 2)

    g = jax.grad(norm)(jnp.asarray(v))
    assert float(jnp.max(jnp.abs(g))) < 1e-9


def test_edge_cases_nz1_and_2d_psi():
    psi, v, kxs, kys = _problem(nz=1, seed=6)
    _compare_vjp(dict(dz=1.0), dict(dz=1.0), psi, v, kxs, kys, DOUBLE, 1e-12)
    # single unbatched probe (2-D psi)
    psi, v, kxs, kys = _problem(nz=3, seed=8)
    _compare_vjp(dict(dz=1.0), dict(dz=1.0), psi[0], v, kxs, kys, DOUBLE,
                 1e-12)


def test_residuals_are_o1():
    """Structural guarantee: the VJP residuals hold NO per-slice wavefield
    (nz x batch x nx x ny) state — only the exit wave and the inputs."""
    psi, v, kxs, kys = _problem(nb=2, nx=16, ny=16, nz=32)
    cfg = (EV, None, 1.0, DOUBLE, None, None)
    from pyslice_tpu.core.constants import wavelength
    cfg = (EV, wavelength(EV), 1.0, DOUBLE, None, None)
    out, res = _ms_diff_fwd(cfg, jnp.asarray(psi), jnp.asarray(v),
                            jnp.asarray(kxs), jnp.asarray(kys), None)
    n_wavefield = psi.size  # complex entries of ONE wavefield batch
    for leaf in jax.tree_util.tree_leaves(res):
        if jnp.iscomplexobj(leaf):
            assert leaf.size <= n_wavefield, (
                f"complex residual of size {leaf.size} — stored per-slice "
                "state?")


def test_f32_drift_at_depth():
    """200-slice float32 chain: the O(1) adjoint's reconstruction roundoff
    must stay near the noise floor of float32 autodiff itself (which stores
    every residual instead of reconstructing). Both run identical f32
    arithmetic, so their difference isolates the reconstruction drift."""
    psi, v, kxs, kys = _problem(nb=2, nx=16, ny=16, nz=200, seed=9,
                                dtype=np.float32)

    # NOTE: the loss must genuinely depend on V — plain total intensity
    # sum|fft2|^2 is V-independent by unitarity (gradient exactly zero),
    # so a detector-weighted intensity is used.
    w = jnp.asarray(np.random.default_rng(1).random((16, 16)), jnp.float32)

    def loss32(pot, f, kw):
        out = f(psi, pot, kxs, kys, eV=EV, dz=0.5, precision=SINGLE, **kw)
        return jnp.mean(w * jnp.abs(jnp.fft.fft2(out)) ** 2)

    v32 = jnp.asarray(v, jnp.float32)
    g_adj = jax.grad(lambda p: loss32(p, multislice_diff, {}))(v32)
    g_ad = jax.grad(lambda p: loss32(p, multislice, dict(fused=False)))(v32)
    rel = (float(jnp.max(jnp.abs(g_adj - g_ad)))
           / (float(jnp.max(jnp.abs(g_ad))) + 1e-30))
    assert rel < 1e-3, f"f32 adjoint drift {rel} at nz=200"


def test_pair_block_mosaic_rule():
    """The pair-kernel tile must keep Mosaic's last-dim rule: divisible
    by 128 or the full axis (regression: halving 128 -> 64 broke 128^2
    grids in the fused backward)."""
    from pyslice_tpu.ops.fused_step_adjoint import _pair_block
    for n in (128, 256, 384, 512, 1024, 2048):
        b = _pair_block(n, n)
        assert n % b == 0
        assert b % 128 == 0 or b == n, (n, b)

"""Pallas TPU kernel: fused phase-grating transmission.

Computes psi' = exp(i * sigma * V) * psi for a probe batch in one pass —
the elementwise half of the multislice step (Kirkland Eq. 6.59/6.66;
reference multislice.py:281-286). The kernel works in split re/im planes
(Pallas TPU has no complex dtype): for each VMEM tile it evaluates
cos/sin(sigma*V) on the VPU and applies the complex rotation

    re' = c * re - s * im
    im' = s * re + c * im

reading V once per probe-tile and never materializing the transmission
function in HBM. The default XLA path (physics.propagate.transmission) hits
the same fusion; this standalone kernel is the building block that grew into
the fully fused per-slice pipeline (ops/fused_step.py, which dispatches
automatically) and is kept as its minimal, independently-tested form
(tests/test_ops.py; bit-exact vs the XLA path on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _kernel(v_ref, re_ref, im_ref, sigma_ref, out_re_ref, out_im_ref):
    from jax.experimental import pallas as pl  # noqa: F401 (doc import)
    sigma = sigma_ref[0, 0]
    phase = sigma * v_ref[:]
    c = jnp.cos(phase)
    s = jnp.sin(phase)
    re = re_ref[:]
    im = im_ref[:]
    out_re_ref[:] = c * re - s * im
    out_im_ref[:] = s * re + c * im


@functools.partial(jax.jit, static_argnames=("tile_rows",))
def transmit_pallas(psi, v, sigma, tile_rows: int = 256):
    """psi' = exp(i sigma V) * psi via a Pallas kernel.

    Args:
        psi: (n_probes, nx, ny) complex64.
        v: (nx, ny) float32 potential slice.
        sigma: scalar interaction parameter.
        tile_rows: VMEM tile height (rows of the nx axis).

    Returns:
        (n_probes, nx, ny) complex64.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_probes, nx, ny = psi.shape
    re = jnp.real(psi).astype(jnp.float32)
    im = jnp.imag(psi).astype(jnp.float32)
    v = v.astype(jnp.float32)
    sigma_arr = jnp.asarray([[sigma]], dtype=jnp.float32)

    rows = min(tile_rows, nx)
    grid = (n_probes, pl.cdiv(nx, rows))

    out_re, out_im = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, ny), lambda p, i: (i, 0),
                         memory_space=pltpu.VMEM),          # V tile
            pl.BlockSpec((1, rows, ny), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),          # psi re
            pl.BlockSpec((1, rows, ny), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),          # psi im
            pl.BlockSpec((1, 1), lambda p, i: (0, 0),
                         memory_space=pltpu.SMEM),           # sigma
        ],
        out_specs=[
            pl.BlockSpec((1, rows, ny), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, ny), lambda p, i: (p, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_probes, nx, ny), jnp.float32),
            jax.ShapeDtypeStruct((n_probes, nx, ny), jnp.float32),
        ],
    )(v, re, im, sigma_arr)
    return jax.lax.complex(out_re, out_im)

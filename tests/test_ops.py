"""Pallas kernels vs the XLA reference path.

Pallas TPU kernels run in interpreter mode on CPU (the tests' platform);
on TPU hardware the same code compiles via Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # CPU test platform: run Pallas in interpreter mode.
    from jax.experimental.pallas import tpu as pltpu
    try:
        ctx = pltpu.force_tpu_interpret_mode()
    except Exception:
        pytest.skip("no interpret mode available")
    with ctx:
        yield


def test_transmit_matches_xla():
    from pyslice_tpu.ops.transmit import transmit_pallas
    from pyslice_tpu.physics.propagate import transmission
    from pyslice_tpu.core.dtypes import SINGLE

    rng = np.random.default_rng(0)
    n_probes, nx, ny = 3, 40, 24
    psi = (rng.standard_normal((n_probes, nx, ny))
           + 1j * rng.standard_normal((n_probes, nx, ny))).astype(np.complex64)
    v = rng.standard_normal((nx, ny)).astype(np.float32)
    sigma = 0.00123

    got = np.asarray(transmit_pallas(jnp.asarray(psi), jnp.asarray(v), sigma,
                                     tile_rows=16))
    want = np.asarray(transmission(jnp.asarray(v), sigma, SINGLE)
                      * jnp.asarray(psi))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_transmit_odd_sizes():
    from pyslice_tpu.ops.transmit import transmit_pallas
    from pyslice_tpu.physics.propagate import transmission
    from pyslice_tpu.core.dtypes import SINGLE

    rng = np.random.default_rng(1)
    n_probes, nx, ny = 2, 17, 13     # deliberately non-tile-aligned
    psi = (rng.standard_normal((n_probes, nx, ny))
           + 1j * rng.standard_normal((n_probes, nx, ny))).astype(np.complex64)
    v = rng.standard_normal((nx, ny)).astype(np.float32)
    got = np.asarray(transmit_pallas(jnp.asarray(psi), jnp.asarray(v), 0.5,
                                     tile_rows=8))
    want = np.asarray(transmission(jnp.asarray(v), 0.5, SINGLE)
                      * jnp.asarray(psi))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

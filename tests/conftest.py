"""Test harness configuration.

Tests run on CPU with 8 virtual devices (the multi-chip story the reference
lacks — SURVEY §4) and with x64 enabled so the float64/complex128
verification mode can be exercised against the NumPy oracle.

Note: JAX_PLATFORMS=cpu via env is ineffective here (the environment's
sitecustomize imports jax first); jax.config.update is the reliable path.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

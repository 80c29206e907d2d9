"""Kirkland atomic form factors.

Parses Kirkland's published parameterization (Appendix C of "Advanced
Computing in Electron Microscopy"; data table ``kirkland_data.txt``, same
published table the reference ships) into a ``(103, 3, 4)`` float64 array of
(a, b, c, d) rows, and evaluates

    f(q^2) = sum_i a_i / (q^2 + b_i) + sum_i c_i * exp(-d_i * q^2)

vectorized over arbitrary q^2 grids and over atomic numbers.

Reference behavior being matched: /root/reference/src/multislice/potentials.py
:50-96 (evaluation), :134-185 (parsing, including the a1 b1 a2 b2 / a3 b3 c1 d1
/ c2 d2 c3 d3 row-reordering documented at :165-171).

The reference's element-name table has a known bug — index 80 holds "Ti"
(duplicate) instead of "Tl", making thallium unreachable
(potentials.py:107, SURVEY.md ledger #2). We fix it here; pass
``compat_reference_tl=True`` to element_to_z for bit-compat behavior.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax.numpy as jnp
import numpy as np

_DATA_FILE = Path(__file__).parent / "kirkland_data.txt"

N_ELEMENTS = 103

ELEMENTS = [
    "H", "He",
    "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar",
    "K", "Ca", "Sc", "Ti", "V", "Cr", "Mn", "Fe", "Co", "Ni", "Cu", "Zn",
    "Ga", "Ge", "As", "Se", "Br", "Kr",
    "Rb", "Sr", "Y", "Zr", "Nb", "Mo", "Tc", "Ru", "Rh", "Pd", "Ag", "Cd",
    "In", "Sn", "Sb", "Te", "I", "Xe",
    "Cs", "Ba",
    "La", "Ce", "Pr", "Nd", "Pm", "Sm", "Eu", "Gd", "Tb", "Dy", "Ho", "Er",
    "Tm", "Yb",
    "Lu", "Hf", "Ta", "W", "Re", "Os", "Ir", "Pt", "Au", "Hg", "Tl", "Pb",
    "Bi", "Po", "At", "Rn",
    "Fr", "Ra",
    "Ac", "Th", "Pa", "U", "Np", "Pu", "Am", "Cm", "Bk", "Cf", "Es", "Fm",
    "Md", "No",
    "Lr", "Rf", "Db", "Sg", "Bh", "Hs", "Mt", "Ds", "Rg", "Cn", "Nh", "Fl",
    "Mc", "Lv", "Ts", "Og",
]


def element_to_z(element: str, compat_reference_tl: bool = False) -> int:
    """Atomic number from element symbol (1-based).

    ``compat_reference_tl=True`` replicates reference bug #2: "Tl" raises
    (unreachable) and "Ti" resolves ambiguously to Z=22 (first match), exactly
    like list.index on the reference's table (potentials.py:98-111).
    """
    if compat_reference_tl and element == "Tl":
        raise ValueError('"Tl" is unreachable in reference-compat mode '
                         "(reference table bug: index 80 holds a duplicate "
                         '"Ti")')
    return ELEMENTS.index(element) + 1


def z_to_element(z: int) -> str:
    return ELEMENTS[int(z) - 1]


@functools.lru_cache(maxsize=1)
def load_parameters() -> np.ndarray:
    """(103, 3, 4) float64 array of (a, b, c, d) Lorentzian+Gaussian params.

    File layout: one header line per element ("Z= n, chisq= ...") followed by
    3 lines x 4 numbers in the order a1 b1 a2 b2 / a3 b3 c1 d1 / c2 d2 c3 d3
    (Kirkland p. 291; cf. reference parser potentials.py:158-175).
    """
    raw = _DATA_FILE.read_text().strip().splitlines()
    if len(raw) != 4 * N_ELEMENTS:
        raise ValueError(f"kirkland_data.txt: expected {4 * N_ELEMENTS} lines, "
                         f"got {len(raw)}")
    params = np.zeros((N_ELEMENTS, 3, 4), dtype=np.float64)
    for i in range(N_ELEMENTS):
        block = raw[4 * i: 4 * i + 4]
        if not block[0].startswith("Z="):
            raise ValueError(f"kirkland_data.txt: bad header at element {i+1}: "
                             f"{block[0]!r}")
        flat = np.array(" ".join(block[1:]).split(), dtype=np.float64)
        a1, b1, a2, b2, a3, b3, c1, d1, c2, d2, c3, d3 = flat
        params[i] = [[a1, b1, c1, d1], [a2, b2, c2, d2], [a3, b3, c3, d3]]
    return params


def form_factor(qsq, z, dtype=None):
    """Evaluate f(q^2) for atomic number(s) ``z`` on a q^2 grid.

    Args:
        qsq: array of |q|^2 in (1/Angstrom)^2, any shape.
        z: scalar atomic number, or 1-D array of atomic numbers (vectorized:
            output gains a leading axis of len(z)).
        dtype: real dtype of the result (defaults to qsq.dtype).

    Returns:
        f(q^2), shape ``qsq.shape`` (scalar z) or ``(len(z),) + qsq.shape``.
    """
    qsq = jnp.asarray(qsq)
    out_dtype = dtype or qsq.dtype
    table = jnp.asarray(load_parameters(), dtype=out_dtype)

    z_arr = jnp.atleast_1d(jnp.asarray(z, dtype=jnp.int32))
    abcd = table[z_arr - 1]                      # (nz, 3, 4)
    a = abcd[..., 0]                             # (nz, 3)
    b = abcd[..., 1]
    c = abcd[..., 2]
    d = abcd[..., 3]

    # Broadcast: (nz, 3, *qsq) against (*qsq,)
    expand = (...,) + (None,) * qsq.ndim
    qsq_b = qsq.astype(out_dtype)[(None, None) + (slice(None),) * qsq.ndim]
    lorentz = jnp.sum(a[expand] / (qsq_b + b[expand]), axis=1)
    gauss = jnp.sum(c[expand] * jnp.exp(-d[expand] * qsq_b), axis=1)
    out = lorentz + gauss                        # (nz, *qsq)
    if jnp.ndim(z) == 0:
        out = out[0]
    return out


def form_factor_np(qsq: np.ndarray, z: int) -> np.ndarray:
    """Pure NumPy float64 oracle (used by tests and the verification mode)."""
    abcd = load_parameters()[int(z) - 1]
    a, b, c, d = abcd[:, 0], abcd[:, 1], abcd[:, 2], abcd[:, 3]
    qsq = np.asarray(qsq, dtype=np.float64)
    expand = (...,) + (None,) * qsq.ndim
    lorentz = np.sum(a[expand] / (qsq[None] + b[expand]), axis=0)
    gauss = np.sum(c[expand] * np.exp(-d[expand] * qsq[None]), axis=0)
    return lorentz + gauss

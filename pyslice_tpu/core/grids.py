"""Real-space / reciprocal-space grid construction.

Reproduces the reference grid semantics exactly — parity of every downstream
array depends on these quirks (/root/reference/src/multislice/potentials.py:113-131):

* ``n = int(length / sampling) + 1`` points per axis,
* ``linspace(0, length, n, endpoint=False)`` so the actual pixel pitch is
  ``length / n`` (slightly *smaller* than the requested sampling),
* slice axis handled identically with ``slice_thickness``.

Known reference quirk (kept for parity, see engine/calculator.py): the
calculator's exported k axes use ``fftfreq(n, requested_sampling)`` while the
physics uses ``fftfreq(n, actual_pitch)`` — see ``kgrid`` vs ``kgrid_nominal``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np


@dataclasses.dataclass(frozen=True)
class Grid:
    """Static (host-side) grid description for one simulation config.

    All members are concrete NumPy arrays / Python floats: grid geometry is
    *static* under jit — shapes and spacings are baked into the compiled
    program, as XLA requires.
    """

    xs: np.ndarray          # (nx,) real-space x coordinates, Angstrom
    ys: np.ndarray          # (ny,)
    zs: np.ndarray          # (nz,) slice coordinates along the slice axis
    lx: float
    ly: float
    lz: float
    sampling: float         # requested in-plane sampling (Angstrom/px)
    slice_thickness: float  # requested slice thickness (Angstrom)
    fast_grid: bool = False  # point counts snapped up to multiples of 128

    @property
    def nx(self) -> int:
        return len(self.xs)

    @property
    def ny(self) -> int:
        return len(self.ys)

    @property
    def nz(self) -> int:
        return len(self.zs)

    @property
    def dx(self) -> float:
        return float(self.xs[1] - self.xs[0])

    @property
    def dy(self) -> float:
        return float(self.ys[1] - self.ys[0])

    @property
    def dz(self) -> float:
        # Reference fallback of 0.5 A for single-slice grids
        # (potentials.py:230, multislice.py:266).
        return float(self.zs[1] - self.zs[0]) if self.nz > 1 else 0.5

    # --- reciprocal axes ---------------------------------------------------

    def kxs(self) -> np.ndarray:
        """Physical k axis (cycles/Angstrom), fftfreq order, actual pitch."""
        return np.fft.fftfreq(self.nx, d=self.dx)

    def kys(self) -> np.ndarray:
        return np.fft.fftfreq(self.ny, d=self.dy)

    def kxs_nominal_shifted(self) -> np.ndarray:
        """The k axis the reference exports in WFData: fftshift(fftfreq(n,
        requested_sampling)) (calculators.py:218-219). Kept verbatim for API
        parity; differs from ``fftshift(kxs())`` by the nx/(nx-ish) pitch
        quirk documented in the module docstring.

        With ``fast_grid`` the point count is snapped up to a multiple of
        128, so the actual pitch can differ from the requested sampling by
        up to ~15% — there the parity quirk would misstate physical k for
        every downstream consumer (HAADF annular masks, dispersion k
        lookups), so the ACTUAL pitch is used instead.
        """
        if self.fast_grid:
            return np.fft.fftshift(self.kxs())
        return np.fft.fftshift(np.fft.fftfreq(self.nx, d=self.sampling))

    def kys_nominal_shifted(self) -> np.ndarray:
        if self.fast_grid:
            return np.fft.fftshift(self.kys())
        return np.fft.fftshift(np.fft.fftfreq(self.ny, d=self.sampling))


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def grid_from_box(lx: float, ly: float, lz: float,
                  sampling: float = 0.1,
                  slice_thickness: float = 0.5,
                  fast_grid: bool = False) -> Grid:
    """Build a Grid from orthogonal box lengths (potentials.py:113-131).

    ``fast_grid=True`` rounds the in-plane point counts UP to multiples of
    128 (slightly finer than the requested sampling), which qualifies the
    grid for the fused Pallas propagation path (~3x; see ops/fused_step).
    Off by default: the reference-exact count is int(l/sampling)+1.
    """
    nx = int(lx / sampling) + 1
    ny = int(ly / sampling) + 1
    nz = int(lz / slice_thickness) + 1
    snapped = False
    if fast_grid:
        nx2, ny2 = _round_up(nx, 128), _round_up(ny, 128)
        snapped = (nx2, ny2) != (nx, ny)
        nx, ny = nx2, ny2
    xs = np.linspace(0.0, lx, nx, endpoint=False)
    ys = np.linspace(0.0, ly, ny, endpoint=False)
    zs = np.linspace(0.0, lz, nz, endpoint=False)
    return Grid(xs=xs, ys=ys, zs=zs, lx=float(lx), ly=float(ly), lz=float(lz),
                sampling=float(sampling), slice_thickness=float(slice_thickness),
                fast_grid=snapped)


def grid_from_trajectory(trajectory, sampling: float = 0.1,
                         slice_thickness: float = 0.5,
                         fast_grid: bool = False) -> Grid:
    """Grid from a trajectory's box matrix diagonal (orthogonal-box assumption,
    potentials.py:115-120)."""
    box = np.asarray(trajectory.box_matrix)
    return grid_from_box(float(box[0, 0]), float(box[1, 1]), float(box[2, 2]),
                         sampling=sampling, slice_thickness=slice_thickness,
                         fast_grid=fast_grid)


def gridFromTrajectory(trajectory, sampling: float = 0.1,
                       slice_thickness: float = 0.5
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                  float, float, float]:
    """Reference-compatible functional facade: returns (xs, ys, zs, lx, ly, lz)
    exactly like /root/reference/src/multislice/potentials.py:113-131."""
    g = grid_from_trajectory(trajectory, sampling, slice_thickness)
    return g.xs, g.ys, g.zs, g.lx, g.ly, g.lz

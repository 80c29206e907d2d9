"""Pure-NumPy LAMMPS dump parser with PBC unwrapping.

Replaces the reference's OVITO dependency (/root/reference/src/io/loader.py:
195-271): parses ``ITEM:``-structured text dumps directly and applies the
equivalent of OVITO's UnwrapTrajectoriesModifier — image flags when the dump
carries them (ix iy iz), otherwise frame-to-frame minimum-image continuity
unwrapping.

Supported atom columns: id, type and/or element (element-name columns map
to atomic numbers directly — dumps written with ``dump_modify element``
carry no numeric type), any of (x y z | xs ys zs | xu yu zu), optional
(vx vy vz), optional (ix iy iz). Atoms are sorted by id so frames line up.
Box origin (xlo, ylo, zlo) is subtracted so coordinates live in [0, L)
like the rest of the framework assumes. Gzipped dumps (.gz or gzip magic
bytes) decompress transparently — the formats the reference inherits from
OVITO (loader.py:195-271).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import numpy as np


def read_text_auto(path) -> str:
    """File contents as text, decompressing gzip transparently (sniffed by
    the 1f 8b magic bytes, so a .gz-less gzipped file also works)."""
    data = Path(path).read_bytes()
    if data[:2] == b"\x1f\x8b":
        import gzip
        data = gzip.decompress(data)
    return data.decode()


def _parse_box(bounds_lines, tilted: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (box_matrix columns-as-cell-vectors, origin)."""
    vals = [list(map(float, ln.split())) for ln in bounds_lines]
    if tilted:
        (xlo_b, xhi_b, xy), (ylo_b, yhi_b, xz), (zlo_b, zhi_b, yz) = vals
        # LAMMPS triclinic: bounding box -> cell (LAMMPS docs' standard recipe)
        xlo = xlo_b - min(0.0, xy, xz, xy + xz)
        xhi = xhi_b - max(0.0, xy, xz, xy + xz)
        ylo = ylo_b - min(0.0, yz)
        yhi = yhi_b - max(0.0, yz)
        zlo, zhi = zlo_b, zhi_b
    else:
        (xlo, xhi), (ylo, yhi), (zlo, zhi) = [v[:2] for v in vals]
        xy = xz = yz = 0.0
    lx, ly, lz = xhi - xlo, yhi - ylo, zhi - zlo
    box = np.array([[lx, xy, xz],
                    [0.0, ly, yz],
                    [0.0, 0.0, lz]], dtype=np.float64)
    origin = np.array([xlo, ylo, zlo], dtype=np.float64)
    return box, origin


def parse_lammps_dump(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a text dump.

    Returns:
        (atom_types (n_atoms,) int32,
         positions (n_frames, n_atoms, 3) float64, unwrapped, origin at 0,
         velocities (n_frames, n_atoms, 3) float64,
         box_matrix (3, 3)).
    """
    lines = read_text_auto(path).splitlines()
    i = 0
    n_lines = len(lines)

    def bad(msg, line_no):
        raise ValueError(f"{path}: line {line_no + 1}: {msg}"
                         + (f" (got: {lines[line_no]!r})"
                            if line_no < n_lines else " (unexpected EOF)"))

    def expect_header(line_no, prefix):
        if line_no >= n_lines or not lines[line_no].startswith(prefix):
            bad(f"expected {prefix!r} header", line_no)

    frames_pos, frames_vel = [], []
    atom_types = None
    box_matrix = None
    has_images = False
    images_list = []

    while i < n_lines:
        if not lines[i].startswith("ITEM: TIMESTEP"):
            i += 1
            continue
        i += 2                                    # skip timestep value
        expect_header(i, "ITEM: NUMBER OF ATOMS")
        try:
            n_atoms = int(lines[i + 1])
        except (ValueError, IndexError):
            bad("expected an integer atom count", i + 1)
        i += 2
        expect_header(i, "ITEM: BOX BOUNDS")
        tilted = ("xy" in lines[i]) or ("xz" in lines[i]) or ("yz" in lines[i])
        if i + 4 > n_lines:
            bad("truncated BOX BOUNDS block", n_lines)
        try:
            box_matrix, origin = _parse_box(lines[i + 1:i + 4], tilted)
        except (ValueError, IndexError):
            bad("malformed BOX BOUNDS values", i + 1)
        i += 4
        expect_header(i, "ITEM: ATOMS")
        cols = lines[i].split()[2:]
        header_line = i
        i += 1

        if i + n_atoms > n_lines:
            bad(f"truncated frame: expected {n_atoms} atom lines, file ends "
                f"after {n_lines - i}", n_lines)
        col = {c: j for j, c in enumerate(cols)}
        rows = [ln.split() for ln in lines[i:i + n_atoms]]
        if "element" in col:
            # Element-name column (dump_modify element ...): replace the
            # symbols with their atomic numbers so the block parses
            # uniformly; they double as the types when no numeric `type`
            # column exists.
            from ..physics.kirkland import element_to_z
            e = col["element"]
            for r, row in enumerate(rows):
                if len(row) == len(cols):
                    try:
                        row[e] = str(element_to_z(row[e]))
                    except ValueError:
                        bad(f"unknown element symbol {row[e]!r}", i + r)
        try:
            block = np.array(rows, dtype=np.float64)
        except ValueError:
            widths = {len(r) for r in rows}
            bad(f"malformed atom block (row widths {sorted(widths)}, header "
                f"declares {len(cols)} columns)", i)
        if block.ndim != 2 or block.shape[1] != len(cols):
            bad(f"atom rows have {block.shape[-1] if block.ndim == 2 else '?'}"
                f" values but the ITEM: ATOMS header declares {len(cols)}",
                header_line)
        i += n_atoms

        order = (np.argsort(block[:, col["id"]]) if "id" in col
                 else np.arange(n_atoms))
        block = block[order]

        if atom_types is None:
            if "type" in col:
                atom_types = block[:, col["type"]].astype(np.int32)
            elif "element" in col:
                atom_types = block[:, col["element"]].astype(np.int32)

        if all(c in col for c in ("x", "y", "z")):
            pos = block[:, [col["x"], col["y"], col["z"]]] - origin
        elif all(c in col for c in ("xu", "yu", "zu")):
            pos = block[:, [col["xu"], col["yu"], col["zu"]]] - origin
        elif all(c in col for c in ("xs", "ys", "zs")):
            frac = block[:, [col["xs"], col["ys"], col["zs"]]]
            pos = frac @ box_matrix.T          # columns are cell vectors
        else:
            raise ValueError(f"Dump has no recognizable coordinate columns: {cols}")

        if all(c in col for c in ("vx", "vy", "vz")):
            vel = block[:, [col["vx"], col["vy"], col["vz"]]]
        else:
            vel = np.zeros_like(pos)

        if all(c in col for c in ("ix", "iy", "iz")):
            has_images = True
            images_list.append(block[:, [col["ix"], col["iy"], col["iz"]]])

        frames_pos.append(pos)
        frames_vel.append(vel)

    if not frames_pos:
        raise ValueError(f"No frames found in {path}")

    positions = np.stack(frames_pos)
    velocities = np.stack(frames_vel)
    if atom_types is None:
        atom_types = np.ones(positions.shape[1], dtype=np.int32)

    if has_images:
        # Unwrap with the full cell: pos += i1*a1 + i2*a2 + i3*a3 where the
        # cell vectors a_j are box_matrix COLUMNS — for triclinic dumps the
        # tilt components matter (diag-only unwrap corrupts tilted cells).
        positions = positions + np.stack(images_list) @ box_matrix.T
    else:
        positions = unwrap_continuity(positions, box_matrix)
    return atom_types, positions, velocities, box_matrix


def unwrap_continuity(positions: np.ndarray, box_matrix: np.ndarray) -> np.ndarray:
    """Frame-to-frame minimum-image unwrap (general, possibly tilted cell).

    Equivalent in effect to OVITO's UnwrapTrajectoriesModifier for
    trajectories sampled finely enough that no atom moves more than half a
    box length between frames. ``box_matrix`` may also be a (3,) diagonal.
    """
    if positions.shape[0] < 2:
        return positions
    box_matrix = np.asarray(box_matrix, dtype=np.float64)
    if box_matrix.ndim == 1:
        box_matrix = np.diag(box_matrix)
    deltas = np.diff(positions, axis=0)
    # Minimum image in fractional coordinates (exact for any cell shape).
    frac = deltas @ np.linalg.inv(box_matrix).T
    deltas = deltas - np.round(frac) @ box_matrix.T
    out = np.empty_like(positions)
    out[0] = positions[0]
    out[1:] = positions[0] + np.cumsum(deltas, axis=0)
    return out


def write_lammps_dump(path, atom_types, positions, velocities, box_matrix,
                      timestep_stride: int = 1) -> None:
    """Write an orthogonal-box text dump (used by the fixture generator and
    loader round-trip tests)."""
    atom_types = np.asarray(atom_types)
    positions = np.asarray(positions)
    velocities = np.asarray(velocities)
    diag = np.diag(np.asarray(box_matrix))
    n_frames, n_atoms = positions.shape[:2]
    with open(path, "w") as f:
        for t in range(n_frames):
            f.write("ITEM: TIMESTEP\n%d\n" % (t * timestep_stride))
            f.write("ITEM: NUMBER OF ATOMS\n%d\n" % n_atoms)
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                f.write("0.0 %.10g\n" % diag[d])
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for a in range(n_atoms):
                f.write("%d %d %.8g %.8g %.8g %.8g %.8g %.8g\n" % (
                    a + 1, int(atom_types[a]),
                    positions[t, a, 0], positions[t, a, 1], positions[t, a, 2],
                    velocities[t, a, 0], velocities[t, a, 1], velocities[t, a, 2]))

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
bytes) decompress transparently, and **binary dumps** (LAMMPS writes them
when the dump filename ends in ``.bin``) are parsed natively — the formats
the reference inherits from OVITO (loader.py:195-271).
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def read_bytes_auto(path) -> bytes:
    """File contents as bytes, decompressing gzip transparently (sniffed by
    the 1f 8b magic bytes, so a .gz-less gzipped file also works)."""
    data = Path(path).read_bytes()
    if data[:2] == b"\x1f\x8b":
        import gzip
        data = gzip.decompress(data)
    return data


def read_text_auto(path) -> str:
    """File contents as text, decompressing gzip transparently."""
    return read_bytes_auto(path).decode()


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


def _frame_from_block(block: np.ndarray, col: dict, box_matrix: np.ndarray,
                      origin: np.ndarray):
    """Per-frame extraction shared by the text and binary parsers: sort the
    numeric atom block by id and pull (pos, vel, images|None, types|None)
    out of its columns.  Coordinate priority matches the reference's OVITO
    behavior: wrapped (x y z) > unwrapped (xu yu zu) > scaled (xs ys zs)."""
    n_atoms = block.shape[0]
    order = (np.argsort(block[:, col["id"]]) if "id" in col
             else np.arange(n_atoms))
    block = block[order]

    types = None
    if "type" in col:
        types = block[:, col["type"]].astype(np.int32)
    elif "element" in col:
        types = block[:, col["element"]].astype(np.int32)

    if all(c in col for c in ("x", "y", "z")):
        pos = block[:, [col["x"], col["y"], col["z"]]] - origin
    elif all(c in col for c in ("xu", "yu", "zu")):
        pos = block[:, [col["xu"], col["yu"], col["zu"]]] - origin
    elif all(c in col for c in ("xs", "ys", "zs")):
        frac = block[:, [col["xs"], col["ys"], col["zs"]]]
        pos = frac @ box_matrix.T          # columns are cell vectors
    else:
        raise ValueError(
            f"Dump has no recognizable coordinate columns: {sorted(col)}")

    if all(c in col for c in ("vx", "vy", "vz")):
        vel = block[:, [col["vx"], col["vy"], col["vz"]]]
    else:
        vel = np.zeros_like(pos)

    images = (block[:, [col["ix"], col["iy"], col["iz"]]]
              if all(c in col for c in ("ix", "iy", "iz")) else None)
    return pos, vel, images, types


def _finalize_frames(path, atom_types, frames_pos, frames_vel, images_list,
                     box_matrix):
    """Stack per-frame arrays and unwrap PBC (image flags if every frame
    carried them, frame-to-frame continuity otherwise)."""
    if not frames_pos:
        raise ValueError(f"No frames found in {path}")
    positions = np.stack(frames_pos)
    velocities = np.stack(frames_vel)
    if atom_types is None:
        atom_types = np.ones(positions.shape[1], dtype=np.int32)
    if len(images_list) == len(frames_pos):
        # Unwrap with the full cell: pos += i1*a1 + i2*a2 + i3*a3 where the
        # cell vectors a_j are box_matrix COLUMNS — for triclinic dumps the
        # tilt components matter (diag-only unwrap corrupts tilted cells).
        positions = positions + np.stack(images_list) @ box_matrix.T
    else:
        positions = unwrap_continuity(positions, box_matrix)
    return atom_types, positions, velocities, box_matrix


def _build_atom_block(rows, cols, col, bad):
    """Rows-of-strings -> validated float64 block (shared by the eager and
    streaming text parsers). ``bad(msg, row_offset)`` raises with position
    info; element-name columns are rewritten to atomic numbers first."""
    if "element" in col:
        from ..physics.kirkland import element_to_z
        e = col["element"]
        for r, row in enumerate(rows):
            if len(row) == len(cols):
                try:
                    row[e] = str(element_to_z(row[e]))
                except ValueError:
                    bad(f"unknown element symbol {row[e]!r}", r)
    try:
        block = np.array(rows, dtype=np.float64)
    except ValueError:
        widths = {len(r) for r in rows}
        bad(f"malformed atom block (row widths {sorted(widths)}, header "
            f"declares {len(cols)} columns)", 0)
    if block.ndim != 2 or block.shape[1] != len(cols):
        bad(f"atom rows have {block.shape[-1] if block.ndim == 2 else '?'}"
            f" values but the ITEM: ATOMS header declares {len(cols)}", 0)
    return block


def parse_lammps_dump(path) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Parse a text or binary dump (sniffed: binary snapshots embed NUL
    bytes in their first words; text dumps are pure ASCII headers).

    Returns:
        (atom_types (n_atoms,) int32,
         positions (n_frames, n_atoms, 3) float64, unwrapped, origin at 0,
         velocities (n_frames, n_atoms, 3) float64,
         box_matrix (3, 3)).
    """
    data = read_bytes_auto(path)
    if b"\x00" in data[:256]:
        return _parse_binary_buffer(data, path)
    lines = data.decode().splitlines()
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
        # Element-name columns (dump_modify element ...) are rewritten to
        # atomic numbers inside the shared block builder.
        block = _build_atom_block(
            rows, cols, col,
            lambda msg, off, _i=i: bad(msg, _i + off))
        i += n_atoms

        pos, vel, images, types = _frame_from_block(block, col, box_matrix,
                                                    origin)
        if atom_types is None:
            atom_types = types
        if images is not None:
            images_list.append(images)
        frames_pos.append(pos)
        frames_vel.append(vel)

    return _finalize_frames(path, atom_types, frames_pos, frames_vel,
                            images_list, box_matrix)


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


def stitch_continuity(prev_last: np.ndarray, positions: np.ndarray,
                      box_matrix: np.ndarray) -> np.ndarray:
    """Shift a whole frame block by one constant per-atom lattice vector so
    its FIRST frame is minimum-image continuous with ``prev_last``.

    Used when concatenating multi-file trajectories: each file is unwrapped
    independently (continuity unwrap re-bases on the file's own first frame),
    so an atom that crossed a periodic boundary inside an earlier file would
    otherwise teleport by a box length at the file seam. For files whose
    unwrap came from absolute image flags the seam delta is already small and
    the shift is exactly zero (no-op).
    """
    box_matrix = np.asarray(box_matrix, dtype=np.float64)
    if box_matrix.ndim == 1:
        box_matrix = np.diag(box_matrix)
    delta = positions[0] - prev_last                     # (n_atoms, 3)
    frac = delta @ np.linalg.inv(box_matrix).T
    shift = -np.round(frac) @ box_matrix.T
    return positions + shift[None, :, :]


# --- binary dumps ------------------------------------------------------------
#
# LAMMPS writes a binary dump when the filename ends in ".bin" (the format
# of src/dump.cpp::write_header/write_data, readable by tools/binary2txt).
# Per snapshot:
#   int64 ntimestep          — NEGATIVE means "magic-string format": the
#                              magnitude is the length of a magic string
#                              ("DUMPATOM"/"DUMPCUSTOM"), followed by
#                              int endianness (0x0001), int format revision,
#                              then the real int64 ntimestep
#   int64 natoms, int triclinic, int boundary[6]
#   double xlo xhi ylo yhi zlo zhi  (+ double xy xz yz when triclinic —
#                              bound-box values, same convention as text)
#   int size_one             — values per atom row
#   [revision >= 2: int len + unit-style chars, char time-flag (+ double
#    time), int len + column-names chars]
#   int nchunk; per chunk: int n, double buf[n]  (n = rows*size_one)
# The reference reads these through OVITO (loader.py:195-271); here they
# parse natively and feed the same column logic as text dumps.

_LEGACY_ATOM_COLUMNS = {5: "id type xs ys zs",
                        8: "id type xs ys zs ix iy iz"}


def parse_lammps_dump_binary(path) -> Tuple[np.ndarray, np.ndarray,
                                            np.ndarray, np.ndarray]:
    """Parse a binary LAMMPS dump (same return contract as
    :func:`parse_lammps_dump`; gzip handled transparently)."""
    return _parse_binary_buffer(read_bytes_auto(path), path)


def _parse_binary_buffer(data: bytes, path):
    n_bytes = len(data)

    def bad(msg, off):
        raise ValueError(f"{path}: binary dump, byte {off}: {msg}")

    # Endianness: the first word is int64 ntimestep — either a small
    # non-negative timestep or a small-magnitude negative magic-string
    # length. Pick the byte order that makes it sane.
    bo = "<"
    for candidate in ("<", ">"):
        (v,) = struct.unpack_from(candidate + "q", data, 0)
        if -64 <= v < 2**48:
            bo = candidate
            break
    else:
        bad("first word is not a plausible timestamp in either byte order", 0)

    frames_pos, frames_vel, images_list = [], [], []
    atom_types = None
    box_matrix = None
    off = 0

    while off < n_bytes:
        if off + 8 > n_bytes:
            bad("truncated snapshot header", off)
        (ntimestep,) = struct.unpack_from(bo + "q", data, off)
        off += 8
        magic = None
        revision = 1
        if ntimestep < 0:
            mlen = -ntimestep
            if mlen > 64 or off + mlen + 16 > n_bytes:
                bad(f"implausible magic-string length {mlen}", off - 8)
            magic = data[off:off + mlen].decode("ascii", "replace")
            off += mlen
            (endian, revision) = struct.unpack_from(bo + "ii", data, off)
            off += 8
            if endian != 0x0001:
                bad(f"endianness marker {endian:#x} contradicts detected "
                    f"byte order {bo!r}", off - 8)
            (ntimestep,) = struct.unpack_from(bo + "q", data, off)
            off += 8

        try:
            (natoms,) = struct.unpack_from(bo + "q", data, off)
            (triclinic,) = struct.unpack_from(bo + "i", data, off + 8)
            off += 12 + 24              # skip int boundary[6]
            n_box = 9 if triclinic else 6
            boxvals = struct.unpack_from(bo + "d" * n_box, data, off)
            off += 8 * n_box
            (size_one,) = struct.unpack_from(bo + "i", data, off)
            off += 4
        except struct.error:
            bad("truncated snapshot header", off)
        if not (0 < natoms < 2**40) or not (0 < size_one < 2**16):
            bad(f"implausible natoms={natoms} / size_one={size_one}", off)

        if triclinic:
            xlo, xhi, ylo, yhi, zlo, zhi, xy, xz, yz = boxvals
            rows = [f"{xlo} {xhi} {xy}", f"{ylo} {yhi} {xz}",
                    f"{zlo} {zhi} {yz}"]
            box_matrix, origin = _parse_box(rows, tilted=True)
        else:
            xlo, xhi, ylo, yhi, zlo, zhi = boxvals
            rows = [f"{xlo} {xhi}", f"{ylo} {yhi}", f"{zlo} {zhi}"]
            box_matrix, origin = _parse_box(rows, tilted=False)

        columns: Optional[str] = None
        if magic is not None and revision >= 2:
            try:
                (ulen,) = struct.unpack_from(bo + "i", data, off)
                off += 4 + max(ulen, 0)               # skip unit style
                (tflag,) = struct.unpack_from(bo + "b", data, off)
                off += 1 + (8 if tflag else 0)        # skip simulation time
                (clen,) = struct.unpack_from(bo + "i", data, off)
                off += 4
                columns = data[off:off + clen].decode("ascii", "replace")
                off += clen
            except struct.error:
                bad("truncated revision-2 header strings", off)
        if columns is None:
            # Legacy header (revision 1 / pre-magic): no column names in the
            # file. `dump atom` layouts are fixed and recoverable from
            # size_one; anything custom is ambiguous — say so usefully.
            if magic in (None, "DUMPATOM") and size_one in _LEGACY_ATOM_COLUMNS:
                columns = _LEGACY_ATOM_COLUMNS[size_one]
            else:
                raise ValueError(
                    f"{path}: legacy binary dump ({magic or 'pre-2020'} "
                    f"revision {revision}) with {size_one} values/atom does "
                    "not record column names. Re-write it with a newer LAMMPS"
                    " (format revision 2 embeds the columns) or dump as text.")

        try:
            (nchunk,) = struct.unpack_from(bo + "i", data, off)
            off += 4
        except struct.error:
            bad("truncated chunk count", off)
        parts = []
        for _ in range(nchunk):
            try:
                (nvals,) = struct.unpack_from(bo + "i", data, off)
            except struct.error:
                bad("truncated chunk length", off)
            off += 4
            if nvals < 0 or off + 8 * nvals > n_bytes:
                bad(f"chunk of {nvals} doubles overruns the file", off - 4)
            parts.append(np.frombuffer(data, dtype=np.dtype(bo + "f8"),
                                       count=nvals, offset=off))
            off += 8 * nvals
        block = np.concatenate(parts) if parts else np.empty(0)
        if block.size != natoms * size_one:
            bad(f"snapshot carries {block.size} values, header promises "
                f"{natoms}x{size_one}", off)
        block = block.reshape(natoms, size_one).astype(np.float64)

        names = columns.split()
        if len(names) != size_one:
            bad(f"column string {columns!r} has {len(names)} names but "
                f"size_one={size_one}", off)
        col = {c: j for j, c in enumerate(names)}

        pos, vel, images, types = _frame_from_block(block, col, box_matrix,
                                                    origin)
        if atom_types is None:
            atom_types = types
        if images is not None:
            images_list.append(images)
        frames_pos.append(pos)
        frames_vel.append(vel)

    return _finalize_frames(path, atom_types, frames_pos, frames_vel,
                            images_list, box_matrix)


def write_lammps_dump_binary(path, atom_types, positions, velocities,
                             box_matrix, timestep_stride: int = 1,
                             legacy: bool = False, nchunk: int = 1) -> None:
    """Write an orthogonal-box binary dump (fixture generator / round-trip
    tests). ``legacy=True`` emits the pre-magic-string header with the
    fixed ``dump atom`` scaled-coordinate layout; otherwise the modern
    revision-2 ``DUMPCUSTOM`` format with explicit column names."""
    atom_types = np.asarray(atom_types)
    positions = np.asarray(positions, dtype=np.float64)
    velocities = np.asarray(velocities, dtype=np.float64)
    diag = np.diag(np.asarray(box_matrix, dtype=np.float64))
    n_frames, n_atoms = positions.shape[:2]
    ids = np.arange(1, n_atoms + 1, dtype=np.float64)
    with open(path, "wb") as f:
        for t in range(n_frames):
            if legacy:
                f.write(struct.pack("<q", t * timestep_stride))
                rows = np.column_stack([ids, atom_types.astype(np.float64),
                                        positions[t] / diag])   # xs ys zs
            else:
                magic = b"DUMPCUSTOM"
                f.write(struct.pack("<q", -len(magic)))
                f.write(magic)
                f.write(struct.pack("<ii", 0x0001, 0x0002))
                f.write(struct.pack("<q", t * timestep_stride))
                rows = np.column_stack([ids, atom_types.astype(np.float64),
                                        positions[t], velocities[t]])
            size_one = rows.shape[1]
            f.write(struct.pack("<qi", n_atoms, 0))
            f.write(struct.pack("<6i", *([0] * 6)))
            for d in range(3):
                f.write(struct.pack("<dd", 0.0, diag[d]))
            f.write(struct.pack("<i", size_one))
            if not legacy:
                f.write(struct.pack("<i", 0))          # no unit style
                f.write(struct.pack("<b", 0))          # no simulation time
                cols = b"id type x y z vx vy vz"
                f.write(struct.pack("<i", len(cols)) + cols)
            f.write(struct.pack("<i", nchunk))
            splits = np.array_split(rows, nchunk)
            for part in splits:
                buf = np.ascontiguousarray(part, dtype="<f8")
                f.write(struct.pack("<i", buf.size))
                f.write(buf.tobytes())


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

"""ctypes binding + build driver for the native LAMMPS dump parser.

``parse_lammps_dump_native`` mirrors io.lammps.parse_lammps_dump for the
common dump layout; when the native library reports an unsupported layout
(triclinic box, scaled coordinates, exotic columns) or isn't buildable, the
caller falls back to the pure-Python parser transparently.

The shared library is compiled on first use with the system g++ (-O3) and
cached next to the source; ``make -C pyslice_tpu/io/native`` (see Makefile)
prebuilds it.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).parent / "native"
_SRC = _NATIVE_DIR / "fast_dump.cpp"
_LIB = _NATIVE_DIR / "libfast_dump.so"

_FLAG_VELOCITIES = 1
_FLAG_IMAGES = 2

_lock = threading.Lock()
_lib_handle = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", str(_LIB), str(_SRC)],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        logger.warning("native dump parser build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib_handle, _build_failed
    with _lock:
        if _lib_handle is not None:
            return _lib_handle
        if _build_failed:
            return None
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.dump_scan.restype = ctypes.c_int
        lib.dump_scan.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.dump_read.restype = ctypes.c_int
        lib.dump_read.argtypes = [
            ctypes.c_char_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _lib_handle = lib
        return lib


def parse_lammps_dump_native(path) -> Optional[
        Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]]:
    """Native-parser result matching io.lammps.parse_lammps_dump, or None
    when the fast path doesn't apply."""
    lib = get_lib()
    if lib is None:
        return None
    n_frames = ctypes.c_int64()
    n_atoms = ctypes.c_int64()
    flags = ctypes.c_int32()
    rc = lib.dump_scan(str(path).encode(), ctypes.byref(n_frames),
                       ctypes.byref(n_atoms), ctypes.byref(flags))
    if rc != 0:
        if rc < 0:
            logger.warning("native dump scan I/O error %d on %s", rc, path)
        return None
    f, a = n_frames.value, n_atoms.value
    positions = np.empty((f, a, 3), dtype=np.float64)
    velocities = np.empty((f, a, 3), dtype=np.float64)
    types = np.zeros(a, dtype=np.int32)
    box = np.zeros(9, dtype=np.float64)
    images = np.zeros((f, a, 3), dtype=np.float64)
    rc = lib.dump_read(str(path).encode(), positions, velocities, types,
                       box, images, f, a)
    if rc != 0:
        logger.warning("native dump read failed (%d) on %s; falling back",
                       rc, path)
        return None
    box_matrix = box.reshape(3, 3)

    from .lammps import unwrap_continuity
    # The native parser only accepts orthogonal boxes (triclinic dumps fall
    # back to the Python parser), so image unwrap via the diagonal is exact.
    diag = np.diag(box_matrix)
    if flags.value & _FLAG_IMAGES:
        positions = positions + images * diag[None, None, :]
    else:
        positions = unwrap_continuity(positions, box_matrix)
    return types, positions, velocities, box_matrix


def _bind_stream_api(lib) -> bool:
    """Bind the incremental entry points (present in rebuilt libraries;
    an older cached .so without them disables the streaming fast path)."""
    if getattr(lib, "_stream_bound", False):
        return True
    try:
        lib.dump_open.restype = ctypes.c_void_p
        lib.dump_open.argtypes = [ctypes.c_char_p]
        lib.dump_close.restype = None
        lib.dump_close.argtypes = [ctypes.c_void_p]
        lib.dump_next_header.restype = ctypes.c_int
        lib.dump_next_header.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
        lib.dump_next_body.restype = ctypes.c_int
        lib.dump_next_body.argtypes = [
            ctypes.c_void_p,
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ]
    except AttributeError:
        return False
    lib._stream_bound = True
    return True


def iter_frames_native(path):
    """Generator of per-frame ``(pos, vel, images|None, types, box)`` —
    the io.stream frame contract — via the incremental native parser, or
    None when the fast path does not apply (library unavailable, or the
    file's layout needs the general Python parser; gated up front by one
    dump_scan pass so iteration never fails over mid-file)."""
    lib = get_lib()
    if lib is None or not _bind_stream_api(lib):
        return None
    n_frames = ctypes.c_int64()
    n_atoms = ctypes.c_int64()
    flags = ctypes.c_int32()
    rc = lib.dump_scan(str(path).encode(), ctypes.byref(n_frames),
                       ctypes.byref(n_atoms), ctypes.byref(flags))
    if rc != 0:
        if rc < 0:
            logger.warning("native dump scan I/O error %d on %s", rc, path)
        return None

    def gen():
        h = lib.dump_open(str(path).encode())
        if not h:
            raise ValueError(f"{path}: cannot open for native streaming")
        try:
            na = ctypes.c_int64()
            fl = ctypes.c_int32()
            while True:
                box9 = np.zeros(9, np.float64)
                rc = lib.dump_next_header(h, ctypes.byref(na),
                                          ctypes.byref(fl), box9)
                if rc == 1:
                    return
                if rc != 0:
                    raise ValueError(
                        f"{path}: native streaming parse failed mid-file "
                        f"(code {rc}) despite a clean pre-scan")
                a = na.value
                pos = np.empty((a, 3), np.float64)
                vel = np.empty((a, 3), np.float64)
                types = np.zeros(a, np.int32)
                images = np.zeros((a, 3), np.float64)
                rc = lib.dump_next_body(h, pos, vel, types, images)
                if rc != 0:
                    raise ValueError(
                        f"{path}: native streaming parse failed "
                        f"(code {rc})")
                has_img = bool(fl.value & _FLAG_IMAGES)
                yield (pos, vel, images if has_img else None, types,
                       box9.reshape(3, 3))
        finally:
            lib.dump_close(h)

    return gen()


def scan_dump_native(path):
    """(n_frames, n_atoms, flags) via one native pass, or None when the
    library is unavailable or the layout needs the Python parser."""
    lib = get_lib()
    if lib is None:
        return None
    n_frames = ctypes.c_int64()
    n_atoms = ctypes.c_int64()
    flags = ctypes.c_int32()
    rc = lib.dump_scan(str(path).encode(), ctypes.byref(n_frames),
                       ctypes.byref(n_atoms), ctypes.byref(flags))
    if rc != 0:
        return None
    return n_frames.value, n_atoms.value, flags.value

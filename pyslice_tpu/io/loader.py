"""TrajectoryLoader — file ingest with transparent caching.

API-parity facade over the pure-NumPy parsers in io.lammps / io.xyz / io.cif
(the reference uses OVITO + ASE, /root/reference/src/io/loader.py:24-287):

* ``TrajectoryLoader(filename, timestep, atom_mapping).load() -> Trajectory``
* ``atom_mapping`` maps dump atom types to atomic numbers (int) or element
  names (str); deprecated ``atomic_numbers`` / ``element_names`` kwargs kept.
* Transparent 4-file ``.npy`` cache next to the input, same layout as the
  reference (loader.py:104-157): <stem>.positions.npy / .velocities.npy /
  .atom_types.npy / .box_matrix.npy. Unlike the reference, the cached
  ``atom_types`` are the RAW dump types and ``atom_mapping`` is applied
  after every cache load — re-running with a different mapping cannot
  silently return the previous mapping's atomic numbers (the reference
  inherits exactly that staleness, loader.py:114-145).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np

from ..data.trajectory import Trajectory
from ..physics.kirkland import element_to_z
from . import cif as cif_io
from . import lammps as lammps_io
from . import xyz as xyz_io

logger = logging.getLogger(__name__)


class TrajectoryLoader:
    def __init__(self,
                 filename: str,
                 timestep: Optional[float] = None,
                 atom_mapping: Optional[Dict[int, Union[int, str]]] = None,
                 atomic_numbers: Optional[Dict[int, int]] = None,
                 element_names: Optional[Dict[int, str]] = None,
                 use_cache: bool = True):
        if timestep is not None and timestep <= 0:
            raise ValueError("timestep must be positive if specified.")
        self.filepath = Path(filename)
        if not self.filepath.exists():
            raise FileNotFoundError(f"Trajectory file not found: {filename}")
        self.timestep = timestep if timestep is not None else 1.0
        self.use_cache = use_cache

        if atomic_numbers is not None:
            logger.warning("atomic_numbers is deprecated; use atom_mapping.")
            atom_mapping = atomic_numbers
        elif element_names is not None:
            logger.warning("element_names is deprecated; use atom_mapping.")
            atom_mapping = element_names
        self.atomic_numbers = self._process_atom_mapping(atom_mapping)

    @staticmethod
    def _process_atom_mapping(mapping) -> Optional[Dict[int, int]]:
        if mapping is None:
            return None
        result = {}
        for atom_type, value in mapping.items():
            if isinstance(value, str):
                result[atom_type] = element_to_z(value)
            elif isinstance(value, (int, np.integer)):
                if not (1 <= value <= 118):
                    raise ValueError(
                        f"Invalid atomic number {value} for type {atom_type}. "
                        "Must be between 1 and 118.")
                result[atom_type] = int(value)
            else:
                raise ValueError(
                    f"Invalid mapping value {value} for type {atom_type}. "
                    "Must be int (atomic number) or str (element name).")
        return result

    def _apply_atomic_mapping(self, atom_types: np.ndarray) -> np.ndarray:
        if self.atomic_numbers is None:
            return atom_types
        mapped = atom_types.copy()
        unmapped = []
        for t in np.unique(atom_types):
            if int(t) in self.atomic_numbers:
                mapped[atom_types == t] = self.atomic_numbers[int(t)]
            else:
                unmapped.append(int(t))
        if unmapped:
            logger.warning("No mapping provided for atom types %s.", unmapped)
        return mapped

    # --- cache ---------------------------------------------------------------

    def _get_cache_files(self) -> Dict[str, Path]:
        stem = self.filepath.parent / self.filepath.stem
        return {
            "positions": stem.with_suffix(".positions.npy"),
            "velocities": stem.with_suffix(".velocities.npy"),
            "atom_types": stem.with_suffix(".atom_types.npy"),
            "box_matrix": stem.with_suffix(".box_matrix.npy"),
        }

    def _load_from_cache(self):
        """Returns raw (atom_types, positions, velocities, box) or None.
        Types are the RAW dump types — the mapping is applied by load()."""
        files = self._get_cache_files()
        if not all(f.exists() for f in files.values()):
            return None
        try:
            logger.info("Loading from cache for %s", self.filepath.name)
            box = np.load(files["box_matrix"])
            if box.shape != (3, 3):
                raise ValueError(f"Invalid box_matrix shape: {box.shape}")
            return (np.load(files["atom_types"]), np.load(files["positions"]),
                    np.load(files["velocities"]), box)
        except Exception as e:   # stale/corrupt cache falls through to re-parse
            logger.warning("Cache loading failed: %s", e)
            return None

    def _save_to_cache(self, types, pos, vel, box) -> None:
        files = self._get_cache_files()
        files["positions"].parent.mkdir(parents=True, exist_ok=True)
        np.save(files["positions"], pos)
        np.save(files["velocities"], vel)
        np.save(files["atom_types"], types)
        np.save(files["box_matrix"], box)

    # --- load ------------------------------------------------------------------

    def load(self) -> Trajectory:
        cached = self._load_from_cache() if self.use_cache else None
        if cached is not None:
            types, pos, vel, box = cached
        else:
            suffix = self.filepath.suffix.lower()
            if suffix == ".cif":
                types, pos, box = cif_io.parse_cif(self.filepath)
                vel = np.zeros_like(pos)
            elif suffix == ".xyz":
                types, pos, vel, box = xyz_io.parse_xyz(self.filepath)
            else:   # LAMMPS dump (.lammpstrj, .dump, ...)
                from .native_loader import parse_lammps_dump_native
                native = parse_lammps_dump_native(self.filepath)
                if native is not None:
                    types, pos, vel, box = native
                else:
                    types, pos, vel, box = lammps_io.parse_lammps_dump(
                        self.filepath)
            if self.use_cache:
                # Cache RAW types: a later load with a different atom_mapping
                # must not inherit this run's mapping (reference quirk).
                self._save_to_cache(np.asarray(types), pos, vel, box)

        types = self._apply_atomic_mapping(np.asarray(types))
        trajectory = Trajectory(atom_types=types, positions=pos,
                                velocities=vel, box_matrix=np.asarray(box),
                                timestep=self.timestep)
        logger.info("Loaded %d frames with %d atoms",
                    trajectory.n_frames, trajectory.n_atoms)
        return trajectory

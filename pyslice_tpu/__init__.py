"""pyslice_tpu — a TPU-native multislice electron-microscopy engine.

A from-scratch JAX/XLA/Pallas rebuild of the TACAW workflow (time-resolved
electron scattering from MD trajectories): trajectory ingest -> Kirkland
projected potentials -> multislice probe propagation -> k-space exit waves
per (probe, frame) -> time-axis FFT -> phonon-resolved diffraction analysis
(spectra, diffraction, dispersion, spectrum images, HAADF-STEM).

Public API mirrors the reference surface (h-walk/PySlice) so existing
workflows port directly; the execution model is pure-functional JAX sharded
over a (frame, probe) device mesh.
"""

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache (big win here: remote compiles cost
    minutes; cached reloads cost seconds). Opt out with
    PYSLICE_TPU_COMPILE_CACHE=0, redirect with =<dir>. Silently skipped if
    the backend is already initialized."""
    setting = _os.environ.get("PYSLICE_TPU_COMPILE_CACHE", "")
    if setting == "0":
        return
    cache_dir = setting or _os.path.expanduser("~/.cache/pyslice_tpu_jax")
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


_enable_compile_cache()

from .core.constants import (C_LIGHT, H_PLANCK, M_ELECTRON, Q_ELECTRON,
                             interaction_parameter, m_effective, wavelength)
from .core.dtypes import DOUBLE, SINGLE, Precision, get_precision, set_default_precision
from .core.grids import Grid, grid_from_box, grid_from_trajectory, gridFromTrajectory
from .data.trajectory import Trajectory
from .data.crystals import crystal, orthogonal_supercell, substitute, vacancies
from .physics.kirkland import element_to_z, form_factor, z_to_element
from .physics.potential import Potential, RasterizerPlan, make_plan, rasterize
from .physics.probe import Probe, create_batched_probes, probe_grid, shift_probes
from .physics.propagate import Propagate, multislice
from .physics.adjoint import multislice_diff
from .io.loader import TrajectoryLoader
from .io.stream import TrajectoryStream
from .io.data4d import (center_datacube, k_sampling_from_disk,
                        load_4dstem, save_4dstem, scan_positions)
from .analysis.calibration import (calibrate_datacube, com_field,
                                   estimate_dose, solve_rotation)
from .engine.calculator import MultisliceCalculator
from .engine.smatrix import (BeamSet, SMatrix, build_beams, compute_smatrix,
                             smatrix_exit_kspace, smatrix_reduce)
from .physics.aberrations import Aberrations
from .analysis.wf_data import WFData
from .analysis.tacaw import TACAWData
from .analysis.haadf import HAADFData
from .analysis.ptychography import (epie_reconstruct, icom_reconstruct,
                                    msp_reconstruct, scan_grid_data,
                                    ssb_reconstruct)
from .analysis.ewr import iwfr_reconstruct
from .engine.ctem import (focal_series, hrtem_image, image_from_exit_wave,
                          objective_transfer)
from .engine.ped import precession_diffraction, precession_tilts
from .engine.inverse import (refine_aberrations, refine_structure,
                             refine_structure_tilt_series)


def getZfromElementName(element: str) -> int:
    """Reference-compatible name (potentials.py:98-111), with the Tl bug fixed."""
    return element_to_z(element)


def kirkland(qsq, Z):
    """Reference-compatible form-factor entry point (potentials.py:50-96)."""
    if isinstance(Z, str):
        Z = element_to_z(Z)
    return form_factor(qsq, Z)


def loadKirkland(device=None):
    """Reference-compatible parameter loader (potentials.py:134-185); the
    table is parsed once and cached — this just forces/returns it."""
    del device
    from .physics.kirkland import load_parameters
    return load_parameters()


__version__ = "0.6.1"

__all__ = [
    "Trajectory", "TrajectoryLoader", "TrajectoryStream", "load_4dstem",
    "center_datacube", "k_sampling_from_disk", "scan_positions",
    "save_4dstem",
    "calibrate_datacube", "com_field", "solve_rotation", "estimate_dose",
    "Grid", "grid_from_box",
    "grid_from_trajectory", "gridFromTrajectory", "Probe", "Potential",
    "Propagate", "multislice", "multislice_diff",
    "create_batched_probes", "probe_grid",
    "shift_probes", "MultisliceCalculator", "WFData", "TACAWData",
    "HAADFData", "ssb_reconstruct", "icom_reconstruct", "epie_reconstruct",
    "msp_reconstruct",
    "scan_grid_data", "hrtem_image", "image_from_exit_wave",
    "objective_transfer", "focal_series", "iwfr_reconstruct",
    "refine_structure", "refine_aberrations",
    "refine_structure_tilt_series",
    "wavelength", "interaction_parameter", "m_effective",
    "form_factor", "kirkland", "loadKirkland", "getZfromElementName", "element_to_z",
    "z_to_element", "Precision", "SINGLE", "DOUBLE", "get_precision",
    "set_default_precision", "RasterizerPlan", "make_plan", "rasterize",
]

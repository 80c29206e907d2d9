"""Frozen-phonon (thermal-configuration-averaged) conveniences.

The standard STEM practice of averaging incoherently over thermally
displaced atomic configurations is expressible with the streaming engines
(each configuration is a "frame"); these one-call facades wrap that for
users converting from frozen-phonon-first packages. Memory stays
O(accumulators) regardless of n_configs (engine.streaming).

Physics note: true frozen-phonon sampling wants zero-mean GAUSSIAN
displacements with std = sqrt(<u^2>) (the Debye-Waller mean-square
displacement), so these facades default to distribution="gaussian" —
unlike Trajectory.generate_random_displacements, whose uniform default
replicates reference quirk #10.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from ..core.grids import grid_from_trajectory
from ..data.trajectory import Trajectory
from ..physics.potential import make_plan
from ..physics.probe import Probe, create_batched_probes
from ..utils.host import device_zeros
from .pipeline import SimSpec
from .streaming import StreamingHAADF


def thermal_configs(trajectory: Trajectory, n_configs: int, sigma: float,
                    seed: Optional[int] = 0,
                    distribution: str = "gaussian") -> Trajectory:
    """n_configs thermally displaced copies of the trajectory's mean
    structure (frozen-phonon ensemble)."""
    mean = trajectory.get_mean_positions()
    base = Trajectory(
        atom_types=np.asarray(trajectory.atom_types),
        positions=mean[None],
        velocities=np.zeros((1,) + mean.shape),
        box_matrix=np.asarray(trajectory.box_matrix),
        timestep=trajectory.timestep,
    )
    return base.generate_random_displacements(
        n_configs, sigma, distribution=distribution, seed=seed)


def _setup(trajectory, aperture, voltage_eV, sampling, slice_thickness,
           probe_positions, fast_grid, configs, defocus=0.0,
           bandwidth_limit=None, tilt=None):
    grid = grid_from_trajectory(trajectory, sampling=sampling,
                                slice_thickness=slice_thickness,
                                fast_grid=fast_grid)
    oblique = grid.is_oblique
    plan = make_plan(grid.xs, grid.ys, grid.zs, configs.positions,
                     configs.atom_types,
                     cell2d=grid.cell2d if oblique else None)
    spec = SimSpec.create(grid, plan, voltage_eV,
                          bandwidth_limit=bandwidth_limit, tilt=tilt)
    base = Probe(grid.xs, grid.ys, aperture, voltage_eV,
                 cell2d=grid.cell2d if oblique else None,
                 ksq=grid.ksq2d() if oblique else None)
    if defocus:
        base.defocus(float(defocus))
    if probe_positions is None:
        probe_positions = [(grid.lx / 2, grid.ly / 2)]
    probes = create_batched_probes(base, probe_positions).array
    return grid, spec, probes, probe_positions


def frozen_phonon_haadf(trajectory: Trajectory,
                        probe_positions,
                        n_configs: int = 8,
                        sigma: float = 0.1,
                        seed: Optional[int] = 0,
                        aperture: float = 30.0,
                        voltage_eV: float = 100e3,
                        sampling: float = 0.1,
                        slice_thickness: float = 0.5,
                        collection_angle: float = 45.0,
                        intensity: bool = True,
                        fast_grid: bool = False,
                        distribution: str = "gaussian",
                        use_smatrix: Optional[bool] = None,
                        prism_f: int = 1,
                        probe_chunk: Optional[int] = None,
                        bandwidth_limit: Optional[float] = None
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Frozen-phonon HAADF image in one call.

    Averages the annular-detector signal over ``n_configs`` displaced
    configurations of the trajectory's mean structure. Returns
    (image (n_x, n_y), scan_xs, scan_ys). Unlike HAADFData's reference-
    parity default, ``intensity`` defaults to True (|psi|^2 — the physical
    detector; quirk #11 is about parity, not physics).

    Large scans auto-route each configuration through the S-matrix
    (engine.smatrix; use_smatrix=None = auto above the measured ~2,000-
    probe crossover, True/False forces; prism_f > 1 trades accuracy for
    an f^2-smaller basis).
    """
    configs = thermal_configs(trajectory, n_configs, sigma, seed,
                              distribution)
    grid, spec, probes, probe_positions = _setup(
        trajectory, aperture, voltage_eV, sampling, slice_thickness,
        probe_positions, fast_grid, configs,
        bandwidth_limit=bandwidth_limit)
    stream = StreamingHAADF(spec, probes, probe_positions,
                            collection_angle=collection_angle,
                            intensity=intensity, mrad=aperture,
                            use_smatrix=use_smatrix, prism_f=prism_f,
                            probe_chunk=probe_chunk)
    # blocked feeding: one scan dispatch per <=8 configs (dispatch
    # amortization; bit-identical to per-frame feeding)
    for c0 in range(0, n_configs, 8):
        stream.add_frame_block(configs.positions[c0:c0 + 8])
    image = stream.image()
    from ..analysis.detectors import _scan_axes
    _, xs, ys = _scan_axes(probe_positions)
    return image, xs, ys


def frozen_phonon_diffraction(trajectory: Trajectory,
                              n_configs: int = 8,
                              sigma: float = 0.1,
                              seed: Optional[int] = 0,
                              aperture: float = 0.0,
                              voltage_eV: float = 100e3,
                              sampling: float = 0.1,
                              slice_thickness: float = 0.5,
                              probe_positions: Optional[Sequence] = None,
                              fast_grid: bool = False,
                              distribution: str = "gaussian",
                              defocus: float = 0.0,
                              bandwidth_limit: Optional[float] = None,
                              tilt: Optional[Tuple[float, float]] = None,
                              configs: Optional[Trajectory] = None
                              ) -> np.ndarray:
    """Thermally averaged diffraction pattern (mean |psi_k|^2 over configs
    and probes), (nx, ny) fftshifted — the frozen-phonon CBED/SAED result.
    The average is incoherent (mean of intensities per configuration), the
    physically correct frozen-phonon combination; configurations stream
    one at a time with an O(nx*ny) accumulator.
    """
    if configs is None:
        configs = thermal_configs(trajectory, n_configs, sigma, seed,
                                  distribution)
    n_configs = configs.n_frames
    grid, spec, probes, probe_positions = _setup(
        trajectory, aperture, voltage_eV, sampling, slice_thickness,
        probe_positions, fast_grid, configs, defocus=defocus,
        bandwidth_limit=bandwidth_limit, tilt=tilt)
    import jax
    import jax.numpy as jnp
    from .pipeline import frame_exit_waves

    @jax.jit
    def fold(acc, pos_block, pr):
        def body(a, pos):
            psi = frame_exit_waves(pos, pr, spec)[..., -1]
            return a + jnp.mean(jnp.abs(psi) ** 2, axis=0), None
        acc, _ = jax.lax.scan(body, acc, pos_block)
        return acc

    acc = device_zeros((grid.nx, grid.ny), spec.precision.real)
    for c0 in range(0, n_configs, 8):
        acc = fold(acc, jnp.asarray(configs.positions[c0:c0 + 8]), probes)
    return np.asarray(acc) / n_configs

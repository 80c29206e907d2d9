"""MultisliceCalculator — the reference-compatible orchestration facade.

Signature parity with /root/reference/src/multislice/calculators.py:39-250
(setup/run, same defaults), over the functional pipeline in engine.pipeline.
Differences (all deliberate, see SURVEY §2 #9 ledger):

* ``defocus`` is actually applied to the base probe (reference accepted the
  parameter but never used it — bug #8);
* the probe batch is built once (frame-independent), not per frame;
* ``batch_size`` bounds the probe-batch size per propagation call to cap HBM
  (the reference accepted it unused — bug #9); None means all probes at once;
* the frame cache (crash-resume) writes one .npy per frame under
  ``psi_data/jax_<md5-12>/`` keyed by an md5 of the simulation parameters,
  mirroring calculators.py:78-94, and cleanup works (bug #3 fixed);
* optional multi-layer recording: ``record_layers`` fills the WFData layer
  axis the reference reserved but never populated (calculators.py:161,221).
"""

from __future__ import annotations

import functools
import hashlib
import logging
import time
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..analysis.wf_data import WFData
from ..core.dtypes import get_precision
from ..core.grids import grid_from_trajectory
from ..data.trajectory import Trajectory
from ..physics.potential import make_plan
from ..physics.probe import Probe, create_batched_probes
from ..utils.host import device_zeros, to_numpy
from .pipeline import (SimSpec, frame_exit_waves, simulate_frames,
                       simulate_frames_into)

logger = logging.getLogger(__name__)


# Process-lifetime jitted placement helper — a per-run ``jax.jit(lambda…)``
# closure costs a retrace + relay compile-cache round trip every run()
# (~0.1-0.3 s through the axon relay); see utils.host.device_zeros.
@functools.partial(jax.jit, donate_argnums=(0,))
def _place_frames(o, frames, i):
    """In-place (donated) placement of a frame block at offset ``i``."""
    return jax.lax.dynamic_update_slice_in_dim(o, frames, i, axis=1)


class MultisliceCalculator:

    def __init__(self, device=None, force_cpu: bool = False, precision=None):
        del device, force_cpu  # JAX owns device placement
        self.precision = get_precision(precision)

    # --- setup ---------------------------------------------------------------

    def _generate_cache_key(self) -> str:
        """md5-12 of the simulation parameters (calculators.py:78-94)."""
        t = self.trajectory
        # Hash the actual atomic positions: counts/box/types alone collide
        # for different thermal realizations of the same system (the
        # reference's key has this hole, calculators.py:81-92).
        pos_digest = hashlib.md5(
            np.ascontiguousarray(t.positions).tobytes()).hexdigest()
        params = {
            "n_frames": t.n_frames,
            "n_atoms": t.n_atoms,
            "positions_md5": pos_digest,
            "box_matrix": np.asarray(t.box_matrix).tolist(),
            "atom_types": np.asarray(t.atom_types).tolist(),
            "aperture": self.aperture,
            "voltage_eV": self.voltage_eV,
            "defocus": self.defocus,
            "aberrations": repr(self.aberrations),
            "slice_thickness": self.slice_thickness,
            "sampling": self.sampling,
            "probe_positions": np.asarray(self.probe_positions).tolist(),
            "record_layers": self.record_layers,
            "slice_axis": self.slice_axis,
            # grid shape captures fast_grid (reference's key misses
            # slice_axis — a latent collision we don't reproduce)
            "grid_shape": (self.nx, self.ny, self.nz),
            "backend": f"jax-{self.precision.name}",
        }
        if getattr(self, "bandwidth_limit", None) is not None:
            # Added only when set: the None default keys identically to
            # pre-feature caches; any other value invalidates them.
            params["bandwidth_limit"] = self.bandwidth_limit
        if getattr(self, "tilt", None) is not None:
            params["tilt"] = self.tilt
        if getattr(self, "debye_waller", None):
            params["debye_waller"] = sorted(
                (str(k), float(v)) for k, v in self.debye_waller.items())
        param_str = str(sorted(params.items()))
        return hashlib.md5(param_str.encode()).hexdigest()[:12]

    def setup(self,
              trajectory: Trajectory,
              aperture: float = 0.0,
              voltage_eV: float = 60e3,
              defocus: float = 0.0,
              slice_thickness: float = 0.5,
              sampling: float = 0.1,
              probe_positions: Optional[List[Tuple[float, float]]] = None,
              batch_size: Optional[int] = None,   # PROBES per call; see below
              save_path: Optional[Path] = None,
              cleanup_temp_files: bool = False,
              slice_axis: int = 2,
              record_layers: Optional[List[int]] = None,
              use_cache: bool = True,
              cache_root: str = "psi_data",
              fast_grid: bool = False,
              frame_block: Optional[int] = None,
              device_output: bool = False,
              aberrations=None,
              mesh=None,
              bandwidth_limit: Optional[float] = None,
              tilt: Optional[Tuple[float, float]] = None,
              debye_waller=None):
        """Reference-compatible setup (calculators.py:96-161).

        ``mesh``: optional jax Mesh with ('frame', 'probe') axes
        (parallel.mesh.make_mesh) — run() then executes the whole frame x
        probe workload sharded over the mesh (parallel.sharded.run_sharded)
        and returns a DEVICE-RESIDENT WFData whose wavefunction_data is
        sharded P('probe', 'frame'); TACAWData / HAADFData consume it
        through the sharded all_to_all / psum paths. This is the reference
        user's workflow (main.py:57-80) scaled to a pod without touching
        parallel.* directly. n_frames and n_probes must divide the mesh's
        frame / probe extents.

        batch_size semantic note (ledger #9): the reference accepts
        ``batch_size: int = 10`` documented as "frames to process at once"
        but never reads it. Here it bounds the PROBES propagated per device
        call (None = all at once) — a caller porting positional arguments
        that relied on the reference's unused frames-meaning gets an HBM
        bound instead of a no-op, never different physics. Frames per
        dispatch are controlled separately by ``frame_block``.

        ``bandwidth_limit``: optional antialiasing band limit as a
        fraction of the tightest-axis Nyquist (2/3 is the standard
        multislice choice — Kirkland's temsim). Zero extra per-step cost
        (folded into the Fresnel multiplier on every kernel path); off by
        default for reference parity. With it on, the propagator is no
        longer exactly unitary: intensity scattered beyond the band is
        removed rather than aliased back in.

        ``tilt``: optional (theta_x, theta_y) beam tilt in mrad —
        tilted-propagator multislice (the beam crosses the cell
        obliquely; equivalent to tilting the specimen by -theta, exact
        to first order). Orthogonal cells only; also zero per-step cost.

        ``debye_waller``: optional {Z or element name: B} Debye-Waller
        factors (B in A^2) — per-element exp(-B |g|^2/4) damping of the
        form factors, the static thermal model. Do not combine with MD /
        frozen-phonon displacements (double-counts thermal motion).
        """
        self.trajectory = trajectory
        self.aperture = aperture
        self.voltage_eV = voltage_eV
        self.defocus = defocus
        # normalize to a canonical Aberrations instance so the frame-cache
        # key (repr-based) is independent of dict insertion order / the
        # dict-vs-dataclass spelling of the same physics
        if isinstance(aberrations, dict):
            from ..physics.aberrations import Aberrations
            aberrations = Aberrations(**aberrations)
        self.aberrations = aberrations
        self.slice_thickness = slice_thickness
        self.sampling = sampling
        self.save_path = save_path
        self.cleanup_temp_files = cleanup_temp_files
        self.slice_axis = slice_axis
        self.batch_size = batch_size
        self.device_output = device_output
        self.mesh = mesh
        if mesh is not None and use_cache:
            logger.info("mesh runs are device-resident; the per-frame host "
                        "cache is disabled (use WFData.save or the "
                        "streaming engines' checkpoints)")
            use_cache = False
        if device_output and use_cache:
            # The per-frame .npy cache exists to survive crashes, but every
            # entry is a host transfer — the exact cost device_output avoids.
            logger.info("device_output=True disables the frame cache "
                        "(use WFData.save for checkpointing)")
            use_cache = False
        self.use_cache = use_cache
        self.frame_block = frame_block

        # fast_grid snaps in-plane point counts up to multiples of 128 so
        # the fused Pallas propagation path applies (~3x on TPU); the
        # effective sampling becomes slightly finer than requested.
        # Accuracy trade (measured, PARITY.md "fast_grid" /
        # tools/fast_grid_error.py): integrated observables move 1-10%
        # relative to the reference-natural grid — within (and slightly
        # toward the converged end of) the discretization envelope of the
        # requested sampling, but NOT reference-grid-reproducible. Keep
        # False when matching reference-natural grids bit-for-bit.
        grid = grid_from_trajectory(trajectory, sampling=sampling,
                                    slice_thickness=slice_thickness,
                                    fast_grid=fast_grid)
        self.grid = grid
        self.xs, self.ys, self.zs = grid.xs, grid.ys, grid.zs
        self.lx, self.ly, self.lz = grid.lx, grid.ly, grid.lz
        self.nx, self.ny, self.nz = grid.nx, grid.ny, grid.nz
        self.dx, self.dy = grid.dx, grid.dy

        if probe_positions is None:
            probe_positions = [(grid.lx / 2, grid.ly / 2)]   # center probe
        self.probe_positions = probe_positions
        self.n_probes = len(probe_positions)
        self.n_frames = trajectory.n_frames
        self.record_layers = (tuple(int(l) for l in record_layers)
                              if record_layers is not None else None)

        oblique = getattr(grid, "is_oblique", False)
        self.base_probe = Probe(grid.xs, grid.ys, aperture, voltage_eV,
                                precision=self.precision,
                                cell2d=grid.cell2d if oblique else None,
                                ksq=grid.ksq2d() if oblique else None)
        if defocus:
            self.base_probe.defocus(defocus)
        if self.aberrations is not None:
            # Beyond-reference: the full aberration surface
            # (physics.aberrations.Aberrations or a coefficient dict,
            # normalized above).
            self.base_probe.aberrate(self.aberrations)
        # Batched probes are a pure function of (base_probe, positions) —
        # both fixed until the next setup(); built lazily once, not per run.
        self._batched_probes = None

        self.debye_waller = dict(debye_waller) if debye_waller else None
        plan = make_plan(grid.xs, grid.ys, grid.zs, trajectory.positions,
                         trajectory.atom_types, kind="kirkland",
                         slice_axis=slice_axis,
                         cell2d=grid.cell2d if oblique else None,
                         debye_waller=debye_waller)
        self.bandwidth_limit = bandwidth_limit
        self.tilt = tuple(float(t) for t in tilt) if tilt is not None \
            else None
        self.spec = SimSpec.create(grid, plan, voltage_eV,
                                   record_layers=self.record_layers,
                                   precision=self.precision,
                                   bandwidth_limit=bandwidth_limit,
                                   tilt=tilt)

        if mesh is not None:
            # early, clear divisibility errors (run_sharded re-checks)
            from ..parallel.sharded import _check_divisible
            _check_divisible(mesh, n_frames=self.n_frames,
                             n_probes=self.n_probes)

        if device_output and mesh is None:
            # Fail loud-and-early instead of OOMing mid-run: estimate the
            # resident exit-wave array and point at the streaming engines,
            # which exist precisely for larger-than-memory runs.
            n_layers = (len(self.record_layers)
                        if self.record_layers else 1)
            est = (self.n_probes * self.n_frames * self.nx * self.ny
                   * n_layers * np.dtype(self.precision.complex).itemsize)
            limit = None
            try:
                import jax
                stats = jax.devices()[0].memory_stats() or {}
                limit = stats.get("bytes_limit")
            except Exception:       # backends without memory_stats
                pass
            if limit is None:
                limit = 16 * 1024 ** 3        # v5e-class HBM
            if est > 0.5 * limit:
                logger.warning(
                    "device_output=True keeps a %.1f GiB exit-wave array "
                    "resident (%d probes x %d frames x %dx%d%s) against "
                    "~%.0f GiB device memory. For larger-than-memory runs "
                    "use engine.streaming.StreamingTACAW/StreamingHAADF "
                    "(O(selected-bins) memory) or record fewer layers.",
                    est / 2 ** 30, self.n_probes, self.n_frames,
                    self.nx, self.ny,
                    f" x {n_layers} layers" if n_layers > 1 else "",
                    limit / 2 ** 30)

        cache_key = self._generate_cache_key()
        self.output_dir = Path(cache_root) / f"jax_{cache_key}"
        if self.use_cache:
            self.output_dir.mkdir(parents=True, exist_ok=True)

    # --- run -------------------------------------------------------------------

    def _auto_frame_block(self) -> int:
        """Frames computed per device dispatch (setup(frame_block=N)).

        Default 1: on this environment the device->host link is the
        bottleneck (~50 MB/s tunnel), so batching frames on device buys
        nothing and costs lax.map overhead. On standard TPU hosts (GB/s DMA,
        ~1 ms dispatch) set frame_block to 8-16 to amortize dispatch."""
        if self.frame_block is not None:
            return max(1, int(self.frame_block))
        return 1

    def _auto_device_block(self) -> int:
        """Frames per dispatch for the DEVICE-RESIDENT run, where no host
        pull happens per frame and dispatch latency dominates (the relayed
        jit round trip here measures ~25-30 ms while the 1-probe frame
        program itself is ~8 ms). Default: up to 8 frames per dispatch,
        bounded so one block stays under ~512 MB of exit waves.
        setup(frame_block=N) overrides."""
        if self.frame_block is not None:
            return max(1, int(self.frame_block))
        n_layers = (len(self.record_layers)
                    if self.record_layers is not None else 1)
        itemsize = np.dtype(self.precision.complex).itemsize
        frame_bytes = self.n_probes * self.nx * self.ny * n_layers * itemsize
        return max(1, min(8, (512 << 20) // max(frame_bytes, 1)))

    def _frame_kspace(self, positions: np.ndarray, probes) -> np.ndarray:
        """(n_probes, nx, ny, n_layers) k-space exit waves for one frame,
        probe-chunked if batch_size is set."""
        bs = self.batch_size
        if bs is None or self.n_probes <= bs:
            return to_numpy(frame_exit_waves(positions, probes, self.spec))
        chunks = [to_numpy(frame_exit_waves(positions, probes[i:i + bs],
                                            self.spec))
                  for i in range(0, self.n_probes, bs)]
        return np.concatenate(chunks, axis=0)

    def _block_kspace(self, positions_block: np.ndarray, probes) -> np.ndarray:
        """(n_probes, n_block, nx, ny, n_layers) for a block of frames."""
        bs = self.batch_size
        if bs is None or self.n_probes <= bs:
            return to_numpy(simulate_frames(positions_block, probes,
                                            self.spec))
        chunks = [to_numpy(simulate_frames(positions_block,
                                           probes[i:i + bs], self.spec))
                  for i in range(0, self.n_probes, bs)]
        return np.concatenate(chunks, axis=0)

    def _probes_array(self):
        """(n_probes, nx, ny) batched probe array, built once per setup.

        Rebuilt only if ``base_probe.array`` was rebound (defocus/aberrate
        replace the immutable array, so identity tracks every legitimate
        post-setup mutation); otherwise run() reuses the same device array
        — the per-run shift dispatch was pure fixed overhead.
        """
        ref = self.base_probe.array
        if self._batched_probes is None or self._batched_probes[0] is not ref:
            batch = create_batched_probes(self.base_probe,
                                          self.probe_positions).array
            self._batched_probes = (ref, batch)
        return self._batched_probes[1]

    def _ksq_shifted(self):
        """fftshifted |k|^2 grid for oblique cells (WFData.ksq_shifted);
        None for orthogonal boxes (the separable axes suffice)."""
        if not getattr(self.grid, "is_oblique", False):
            return None
        return np.fft.fftshift(self.grid.ksq2d())

    def _wf_axes(self):
        """(kxs, kys, time, layer) exported arrays (quirk #12 handling in
        core.grids.kxs_nominal_shifted)."""
        kxs = self.grid.kxs_nominal_shifted()
        kys = self.grid.kys_nominal_shifted()
        time_array = np.arange(self.n_frames) * self.trajectory.timestep
        layer_array = (np.asarray(self.record_layers)
                       if self.record_layers is not None else np.array([0]))
        return kxs, kys, time_array, layer_array

    def _run_device(self, progress: bool = True) -> WFData:
        """Device-resident run: exit waves accumulate into one HBM array and
        NEVER cross to the host — WFData.wavefunction_data is a jax array
        that TACAWData / HAADFData consume directly (host conversion happens
        only at their final, small reductions). Closes the >99%-transfer
        bottleneck of the host path on slow-DMA hosts (VERDICT item 3)."""
        t0 = time.time()
        n_layers = (len(self.record_layers)
                    if self.record_layers is not None else 1)
        shape = (self.n_probes, self.n_frames, self.nx, self.ny, n_layers)
        out = device_zeros(shape, np.dtype(self.precision.complex))
        probes = self._probes_array()

        bs = self.batch_size
        block = self._auto_device_block()
        progress_bar = None
        if progress:
            try:
                from tqdm import tqdm
                progress_bar = tqdm(total=self.n_frames,
                                    desc="Processing frames", unit="frame")
            except ImportError:
                pass
        for i0 in range(0, self.n_frames, block):
            nb = min(block, self.n_frames - i0)
            new_frames = nb          # frames not yet counted by the bar
            if nb < block and i0 >= block - nb:
                # A partial tail block would compile a SECOND program (the
                # frame count is a static shape; each compile costs tens of
                # seconds through the relay). Recompute a full block ending
                # at the last frame instead: the overlapping frames are
                # deterministic replays of values already placed, so the
                # overwrite is bit-identical and the whole run uses ONE
                # program shape.
                i0, nb = self.n_frames - block, block
            pos = jnp.asarray(np.asarray(
                self.trajectory.positions[i0:i0 + nb]))
            if bs is None or self.n_probes <= bs:
                # Fused compute+place: one dispatch per block, i0 traced.
                out = simulate_frames_into(out, i0, pos, probes, self.spec)
            else:
                fk = jnp.concatenate(
                    [simulate_frames(pos, probes[j:j + bs], self.spec)
                     for j in range(0, self.n_probes, bs)], axis=0)
                out = _place_frames(out, fk, jnp.asarray(i0, jnp.int32))
            if progress_bar:
                # The overlapped tail block replays already-counted frames;
                # only the genuinely new ones advance the bar.
                progress_bar.update(new_frames)
        if progress_bar:
            progress_bar.close()
        logger.info("Device-resident simulation dispatched in %.2fs",
                    time.time() - t0)

        kxs, kys, time_array, layer_array = self._wf_axes()
        wf_data = WFData(probe_positions=self.probe_positions,
                         time=time_array, kxs=kxs, kys=kys,
                         layer=layer_array, wavefunction_data=out,
                         probe=self.base_probe,
                         ksq_shifted=self._ksq_shifted())
        if self.save_path is not None:
            save_dir = Path(self.save_path)
            save_dir.mkdir(parents=True, exist_ok=True)
            wf_data.save(save_dir / "wf_data.npz")
        return wf_data

    def _run_mesh(self) -> WFData:
        """Multi-chip run through the facade: one sharded dispatch over the
        ('frame', 'probe') mesh (parallel.sharded.run_sharded — the
        reference's serial frame loop, calculators.py:172, becomes the
        mesh's frame axis). The returned WFData is device-resident and
        sharded P('probe', 'frame'); analysis consumes it without any
        global gather (TACAWData routes through the all_to_all time-FFT)."""
        import jax.numpy as jnp
        from ..parallel.sharded import run_sharded

        t0 = time.time()
        probes = self._probes_array()
        positions = jnp.asarray(np.asarray(self.trajectory.positions))
        wf = run_sharded(positions, probes, self.spec, self.mesh)
        logger.info("Sharded simulation dispatched in %.2fs over mesh %s",
                    time.time() - t0, dict(self.mesh.shape))

        kxs, kys, time_array, layer_array = self._wf_axes()
        wf_data = WFData(probe_positions=self.probe_positions,
                         time=time_array, kxs=kxs, kys=kys,
                         layer=layer_array, wavefunction_data=wf,
                         probe=self.base_probe,
                         ksq_shifted=self._ksq_shifted())
        if self.save_path is not None:
            save_dir = Path(self.save_path)
            save_dir.mkdir(parents=True, exist_ok=True)
            wf_data.save(save_dir / "wf_data.npz")
        return wf_data

    def run(self, progress: bool = True) -> WFData:
        if self.mesh is not None:
            return self._run_mesh()
        if self.device_output:
            return self._run_device(progress)
        t0 = time.time()
        n_layers = (len(self.record_layers)
                    if self.record_layers is not None else 1)
        out = np.zeros((self.n_probes, self.n_frames, self.nx, self.ny,
                        n_layers), dtype=np.complex128
                       if self.precision.name == "double" else np.complex64)

        probes = self._probes_array()

        frames_computed = frames_cached = 0
        block = self._auto_frame_block()

        def cache_path(i):
            return self.output_dir / f"frame_{i}.npy"

        # Partition frames into cached singles and contiguous uncached runs
        # computed as device blocks (one dispatch + one pull per block).
        pending = []
        progress_bar = None
        if progress:
            try:
                from tqdm import tqdm
                progress_bar = tqdm(total=self.n_frames,
                                    desc="Processing frames", unit="frame")
            except ImportError:
                pass

        def flush_pending():
            nonlocal frames_computed
            while pending:
                chunk = pending[:block]
                del pending[:block]
                if len(chunk) == 1:
                    data = self._frame_kspace(np.asarray(
                        self.trajectory.positions[chunk[0]]), probes)[:, None]
                else:
                    pos = np.asarray(
                        self.trajectory.positions[np.asarray(chunk)])
                    target = min(block, self.n_frames)
                    if len(chunk) < target:
                        # Pad the partial block (repeat the last frame) so
                        # every multi-frame dispatch reuses ONE compiled
                        # program shape — a fresh block-size compile costs
                        # tens of seconds through the relay, the padded
                        # frames well under a second.
                        pos = np.concatenate(
                            [pos, np.repeat(pos[-1:],
                                            target - len(chunk), axis=0)])
                    data = self._block_kspace(pos, probes)
                for j, fi in enumerate(chunk):
                    out[:, fi] = data[:, j]
                    if self.use_cache:
                        np.save(cache_path(fi), data[:, j])
                frames_computed += len(chunk)
                if progress_bar:
                    progress_bar.update(len(chunk))

        for frame_idx in range(self.n_frames):
            if self.use_cache and cache_path(frame_idx).exists():
                flush_pending()
                out[:, frame_idx] = np.load(cache_path(frame_idx))
                frames_cached += 1
                if progress_bar:
                    progress_bar.update(1)
            else:
                pending.append(frame_idx)
        flush_pending()
        if progress_bar:
            progress_bar.close()

        logger.info("Simulation completed in %.2fs (%d computed, %d cached)",
                    time.time() - t0, frames_computed, frames_cached)

        # Reference parity: exported k axes use the *requested* sampling
        # (calculators.py:218-219), not the actual grid pitch — see
        # core.grids docstring for the quirk.
        kxs, kys, time_array, layer_array = self._wf_axes()

        wf_data = WFData(probe_positions=self.probe_positions,
                         time=time_array, kxs=kxs, kys=kys,
                         layer=layer_array, wavefunction_data=out,
                         probe=self.base_probe,
                         ksq_shifted=self._ksq_shifted())

        if self.use_cache and self.cleanup_temp_files:
            for frame_idx in range(self.n_frames):   # bug #3 fixed
                f = self.output_dir / f"frame_{frame_idx}.npy"
                if f.exists():
                    f.unlink()
            try:
                self.output_dir.rmdir()
            except OSError:
                pass

        if self.save_path is not None:
            save_dir = Path(self.save_path)
            save_dir.mkdir(parents=True, exist_ok=True)
            wf_data.save(save_dir / "wf_data.npz")

        return wf_data

"""HAADF-STEM image formation from WFData.

Mirrors /root/reference/src/postprocessing/haadf_data.py:35-73 with the same
semantics, vectorized:

* scan grid reconstructed from the unique probe x/y coordinates;
* annular dark-field mask q > (collection_angle mrad)/lambda;
* per scan point: nearest probe position, then
  mean over frames( sum over k( |psi_hat * mask| ) ).

Parity note (reference quirk #11, kept as the default): the collected signal
uses the *amplitude* |psi_hat|, not the intensity |psi_hat|^2. Pass
``intensity=True`` for the physically conventional |psi_hat|^2 detector.

Design difference: composition instead of the shared-``__dict__``
reparenting hack (haadf_data.py:37-41, bug #6), and ``probe_positions`` may
be a list of tuples or an (n, 2) array (the reference requires an ndarray,
bug: haadf_data.py:44 vs wf_data.py:22).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .wf_data import WFData


class HAADFData:
    def __init__(self, wf_data: WFData):
        self.probe_positions = np.asarray(wf_data.probe_positions, dtype=np.float64)
        self.time = wf_data.time
        self.kxs = np.asarray(wf_data.kxs)
        self.kys = np.asarray(wf_data.kys)
        self.layer = wf_data.layer
        self.wavefunction_data = wf_data.wavefunction_data
        self.probe = wf_data.probe
        self.ksq_shifted = getattr(wf_data, "ksq_shifted", None)

    def calculateADF(self, collection_angle: float = 45,
                     preview: bool = False, intensity: bool = False) -> np.ndarray:
        """Annular dark-field image over the reconstructed scan grid
        (haadf_data.py:43-65). Returns (n_x, n_y); also stored as self.adf."""
        positions = self.probe_positions
        self.xs = np.array(sorted(set(positions[:, 0].tolist())))
        self.ys = np.array(sorted(set(positions[:, 1].tolist())))

        if self.ksq_shifted is not None:      # oblique cell: true |k|
            q = np.sqrt(np.asarray(self.ksq_shifted))
        else:
            q = np.sqrt(self.kxs[:, None] ** 2 + self.kys[None, :] ** 2)
        radius = (collection_angle * 1e-3) / self.probe.wavelength
        mask = (q > radius).astype(np.float64)

        # Nearest probe for every (x, y) scan point, vectorized.
        gx, gy = np.meshgrid(self.xs, self.ys, indexing="ij")
        grid_pts = np.stack([gx.ravel(), gy.ravel()], axis=1)   # (nxy, 2)
        d2 = (np.sum(grid_pts ** 2, axis=1)[:, None]
              - 2.0 * grid_pts @ positions.T
              + np.sum(positions ** 2, axis=1)[None, :])
        nearest = np.argmin(d2, axis=1)                          # (nxy,)

        # Per-probe collected signal: mean over frames of the masked k sum of
        # the last recorded layer (haadf_data.py:56-64). Device-resident
        # WFData (calculator device_output=True) reduces on device; only the
        # (n_probes,) result crosses to the host. Mesh-sharded WFData
        # (calculator mesh=...) reduces through shard_map — psum over
        # frames, all_gather over probes — so no eager op touches a
        # potentially non-addressable shard on a multi-host mesh.
        from ..parallel.sharded import collected_sharded, sharded_mesh_of
        mesh = sharded_mesh_of(self.wavefunction_data)
        if mesh is not None:
            collected = np.asarray(jax.device_get(collected_sharded(
                self.wavefunction_data, mesh, mask,
                intensity=intensity)))[:, 0]                     # (n_probes,)
        else:
            xp = (jnp if isinstance(self.wavefunction_data, jax.Array)
                  else np)
            exits = xp.abs(self.wavefunction_data[:, :, :, :, -1])
            if intensity:
                exits = exits ** 2
            collected = np.asarray(
                xp.mean(xp.sum(exits * xp.asarray(mask)[None, None, :, :],
                               axis=(2, 3)), axis=1))            # (n_probes,)

        self.adf = collected[nearest].reshape(len(self.xs), len(self.ys))

        if preview:  # pragma: no cover - visualization helper
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            p0 = nearest[0]
            amp = np.asarray(xp.mean(
                xp.abs(self.wavefunction_data[p0, :, :, :, -1]), axis=0))
            ax.imshow(amp ** 0.1 * (1 - mask), cmap="inferno")
            plt.show()
        return self.adf

    def ADF(self, collection_angle: float = 45, preview: bool = False,
            intensity: bool = False) -> np.ndarray:
        """Alias so the reference demo workflow runs (main.py:218 calls
        ``.ADF`` although the reference only defines calculateADF — bug #1)."""
        return self.calculateADF(collection_angle, preview, intensity)

    def plot(self):  # pragma: no cover - visualization helper
        import matplotlib.pyplot as plt
        fig, ax = plt.subplots()
        extent = (self.xs.min(), self.xs.max(), self.ys.min(), self.ys.max())
        ax.imshow(self.adf.T, cmap="inferno", extent=extent)
        plt.show()

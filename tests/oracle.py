"""Independent float64 NumPy oracle for parity testing.

A deliberately naive, loop-based implementation of the TACAW numerics,
written directly from the documented physics (Kirkland Eqs. 5.6/6.59/6.65/
6.66; /root/reference/math.txt) and the reference's documented edge rules.
The framework's compiled kernels are checked against this oracle with the
scale-invariant magnitude residual the reference uses as its regression
metric: dz = sum((|F|-|D|)^2) / sum(|F|^2) <= 1e-6.
"""

from __future__ import annotations

import numpy as np

from pyslice_tpu.core.constants import interaction_parameter, wavelength
from pyslice_tpu.physics.kirkland import element_to_z, form_factor_np


def residual(result, expected) -> float:
    """The reference's scale-invariant magnitude residual (00_probe.py:26)."""
    f = np.abs(np.asarray(result, dtype=np.complex128))
    d = np.abs(np.asarray(expected, dtype=np.complex128))
    return float(np.sum((f - d) ** 2) / np.sum(f ** 2))


def oracle_probe(xs, ys, mrad, eV):
    """Aperture-mask probe (plane wave for mrad == 0)."""
    nx, ny = len(xs), len(ys)
    if mrad == 0:
        return np.ones((nx, ny), dtype=np.complex128)
    lam = wavelength(eV)
    radius = (mrad * 1e-3) / lam
    kxs = np.fft.fftfreq(nx, d=xs[1] - xs[0])
    kys = np.fft.fftfreq(ny, d=ys[1] - ys[0])
    mask = (np.sqrt(kxs[:, None] ** 2 + kys[None, :] ** 2) < radius)
    return np.fft.ifftshift(np.fft.ifft2(mask.astype(np.complex128)))


def oracle_shift(base, kxs, kys, positions):
    """k-space phase-ramp shifts -> (n_probes, nx, ny)."""
    out = []
    bk = np.fft.fft2(base)
    for px, py in positions:
        ramp = (np.exp(2j * np.pi * kxs[:, None] * px)
                * np.exp(2j * np.pi * kys[None, :] * py))
        out.append(np.fft.ifft2(bk * ramp))
    return np.stack(out)


def oracle_potential(xs, ys, zs, positions, atom_types, kind="kirkland",
                     slice_axis=2):
    """(nx, ny, n_slices) real projected potential, naive per-atom loops.

    Edge rules per the reference: slice s spans
    [coord_s - d/2, coord_s + d/2), except the first bin starts at 0 and the
    last extends a full spacing past the final coordinate.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    zs = np.asarray(zs, dtype=np.float64)
    positions = np.asarray(positions, dtype=np.float64)

    inplane = [0, 1, 2]
    inplane.remove(slice_axis)
    ax1, ax2 = inplane
    coord_arrays = [xs, ys, zs]
    slice_coords = coord_arrays[slice_axis]
    n_slices = len(slice_coords)
    spacing = (slice_coords[1] - slice_coords[0]) if n_slices > 1 else 0.5

    nx, ny = len(xs), len(ys)
    dx, dy = xs[1] - xs[0], ys[1] - ys[0]
    kxs = np.fft.fftfreq(nx, d=dx)
    kys = np.fft.fftfreq(ny, d=dy)
    qsq = kxs[:, None] ** 2 + kys[None, :] ** 2

    zed = []
    for t in np.asarray(atom_types):
        zed.append(element_to_z(str(t)) if isinstance(t, (str, np.str_)) else int(t))
    zed = np.asarray(zed)

    ff = {}
    for z in np.unique(zed):
        if kind == "kirkland":
            ff[z] = form_factor_np(qsq, z)
        else:
            ff[z] = np.exp(-qsq / 2.0)

    recip = np.zeros((nx, ny, n_slices), dtype=np.complex128)
    for s in range(n_slices):
        lo = 0.0 if s == 0 else slice_coords[s] - spacing / 2
        hi = (slice_coords[s] + spacing / 2 if s < n_slices - 1
              else slice_coords[-1] + spacing)
        for a in range(positions.shape[0]):
            c = positions[a, slice_axis]
            if not (c >= lo and c < hi):
                continue
            ex = np.exp(-2j * np.pi * kxs * positions[a, ax1])
            ey = np.exp(-2j * np.pi * kys * positions[a, ax2])
            recip[:, :, s] += np.outer(ex, ey) * ff[zed[a]]

    pot = np.empty((nx, ny, n_slices), dtype=np.float64)
    for s in range(n_slices):
        pot[:, :, s] = np.real(np.fft.ifft2(recip[:, :, s]))
    return pot / (dx ** 2 * dy ** 2)


def oracle_propagate(psi, potential_xyz, xs, ys, zs, eV, kmax2=None,
                     tantilt=None):
    """Multislice loop: transmit each slice, Fresnel-propagate between
    slices (skipped after the last). psi: (..., nx, ny). ``kmax2``:
    optional antialiasing band limit — zero the propagator outside
    |k|^2 <= kmax2 (Kirkland temsim convention). ``tantilt``: optional
    (tan tx, tan ty) tilted-propagator phase."""
    lam = wavelength(eV)
    sigma = interaction_parameter(eV)
    dz = (zs[1] - zs[0]) if len(zs) > 1 else 0.5
    kxs = np.fft.fftfreq(len(xs), d=xs[1] - xs[0])
    kys = np.fft.fftfreq(len(ys), d=ys[1] - ys[0])
    k2 = kxs[:, None] ** 2 + kys[None, :] ** 2
    P = np.exp(-1j * np.pi * lam * dz * k2)
    if tantilt is not None:
        P = P * np.exp(2j * np.pi * dz * (kxs[:, None] * tantilt[0]
                                          + kys[None, :] * tantilt[1]))
    if kmax2 is not None:
        P = P * (k2 <= kmax2)

    psi = np.asarray(psi, dtype=np.complex128).copy()
    n_slices = potential_xyz.shape[2]
    for s in range(n_slices):
        t = np.exp(1j * sigma * potential_xyz[:, :, s])
        psi = t * psi
        if s < n_slices - 1:
            psi = np.fft.ifft2(P * np.fft.fft2(psi, axes=(-2, -1)),
                               axes=(-2, -1))
    return psi


def oracle_pipeline(trajectory, aperture=0.0, voltage_eV=100e3,
                    slice_thickness=0.5, sampling=0.1, probe_positions=None,
                    frames=None):
    """Full production path -> (probes, frames, nx, ny, 1) fftshifted k-space.

    ``frames``: optional list of frame indices — at production scale
    (1024^2, thousands of atoms) the naive f64 oracle costs minutes per
    frame, so the on-hardware e2e tests verify a frame subset (round-5
    verdict item 4) rather than every frame.
    """
    box = np.asarray(trajectory.box_matrix)
    lx, ly, lz = box[0, 0], box[1, 1], box[2, 2]
    nx = int(lx / sampling) + 1
    ny = int(ly / sampling) + 1
    nz = int(lz / slice_thickness) + 1
    xs = np.linspace(0, lx, nx, endpoint=False)
    ys = np.linspace(0, ly, ny, endpoint=False)
    zs = np.linspace(0, lz, nz, endpoint=False)

    if probe_positions is None:
        probe_positions = [(lx / 2, ly / 2)]
    base = oracle_probe(xs, ys, aperture, voltage_eV)
    kxs = np.fft.fftfreq(nx, d=xs[1] - xs[0])
    kys = np.fft.fftfreq(ny, d=ys[1] - ys[0])
    probes = oracle_shift(base, kxs, kys, probe_positions)

    if frames is None:
        frames = range(trajectory.n_frames)
    frames = list(frames)
    out = np.zeros((len(probe_positions), len(frames), nx, ny, 1),
                   dtype=np.complex128)
    for i, f in enumerate(frames):
        pot = oracle_potential(xs, ys, zs, trajectory.positions[f],
                               trajectory.atom_types)
        exit_waves = oracle_propagate(probes, pot, xs, ys, zs, voltage_eV)
        k = np.fft.fftshift(np.fft.fft2(exit_waves, axes=(-2, -1)),
                            axes=(-2, -1))
        out[:, i, :, :, 0] = k
    return out


def oracle_time_fft(wf_layer):
    """(probes, time, kx, ky) -> intensity, mean-subtracted time FFT."""
    wf = np.asarray(wf_layer, dtype=np.complex128)
    wf = wf - wf.mean(axis=1, keepdims=True)
    fft = np.fft.fftshift(np.fft.fft(wf, axis=1), axes=1)
    return np.abs(fft) ** 2

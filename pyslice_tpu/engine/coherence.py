"""Partial coherence models (beyond-reference).

The reference simulates a perfectly coherent point source. Real guns have
a finite source size (spatial/lateral coherence) and an energy spread that
defocuses chromatically (temporal coherence). Both act INCOHERENTLY — they
average intensities, not amplitudes — so they compose with any detector
reduction in this framework:

* ``source_size_blur``  — convolve a scan-space image (HAADF / virtual
  image / spectrum image) with the effective source Gaussian. Exact for
  STEM images because a shifted incoherent source is a shifted probe.
* ``defocus_series``    — the chromatic envelope: Gauss-Hermite defocus
  quadrature nodes/weights over the defocus spread
  delta = Cc * (dE/E); run the simulation per node (probe.defocus or
  setup(defocus=...)) and average intensities with the weights.

Both follow the standard treatment (Kirkland ch. 5; abTEM's
partial-coherence models).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def source_size_blur(image, scan_step: Tuple[float, float],
                     fwhm: float):
    """Blur a scan-grid image by the effective source (FWHM in Angstrom).

    image: (nx_scan, ny_scan) real array on a regular scan grid with
    spacing ``scan_step`` = (dx, dy) Angstrom. Gaussian convolution with
    periodic handling via FFT (scan fields are typically much larger than
    the source; edge wrap is negligible for fwhm << scan extent).
    """
    img = np.asarray(image, dtype=np.float64)
    if img.ndim != 2:
        raise ValueError(f"expected a 2-D scan image, got {img.shape}")
    if fwhm <= 0:
        return img
    sigma = fwhm / (2.0 * np.sqrt(2.0 * np.log(2.0)))
    nx, ny = img.shape
    fx = np.fft.fftfreq(nx, d=scan_step[0])
    fy = np.fft.fftfreq(ny, d=scan_step[1])
    # Gaussian's Fourier transform: exp(-2 pi^2 sigma^2 f^2)
    env = np.exp(-2.0 * np.pi ** 2 * sigma ** 2
                 * (fx[:, None] ** 2 + fy[None, :] ** 2))
    return np.real(np.fft.ifft2(np.fft.fft2(img) * env))


def defocus_spread(Cc: float, dE: float, eV: float) -> float:
    """1/e half-width of the chromatic defocus distribution:
    delta = Cc * dE/E (Kirkland Eq. 5.39 form). Cc and result in
    Angstrom; dE/eV in eV (FWHM energy spread)."""
    return float(Cc) * float(dE) / float(eV)


def defocus_series(delta: float, n: int = 7,
                   center: float = 0.0) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Hermite quadrature (defocus nodes, weights) for incoherent
    averaging over the chromatic defocus distribution
    p(df) ~ exp(-(df - center)^2 / delta^2).

    Run the simulation at each returned defocus and average the resulting
    INTENSITIES with the weights (they sum to 1):

        nodes, w = defocus_series(defocus_spread(Cc, dE, eV), n=7)
        img = sum(wi * simulate(defocus=di) for di, wi in zip(nodes, w))
    """
    if n < 1:
        raise ValueError("need at least one quadrature node")
    if delta <= 0:
        return np.array([center]), np.array([1.0])
    x, w = np.polynomial.hermite.hermgauss(n)   # weight exp(-x^2)
    return center + delta * x, w / np.sqrt(np.pi)

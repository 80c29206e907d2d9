"""Measured-data calibration for 4D-STEM datacubes (round-4 item 2).

The simulation pipeline produces ideal cubes; measured data carries four
instrument artifacts that must be solved *from the data itself* before the
reconstruction tools (`analysis.ptychography`, `engine.inverse`) can be
trusted on it:

1. **Scan <-> detector rotation / transpose** (`solve_rotation`,
   `apply_rotation`): the camera is mounted at an arbitrary azimuth
   relative to the scan axes, and acquisition software may swap the
   detector axes. A wrong orientation makes the center-of-mass deflection
   field non-conservative, so iCoM/SSB/MSP reconstruct a curl-violating
   (wrong) phase. The solve uses the physics constraint the ptychography
   module already diagnoses (`icom_reconstruct`'s ``curl_rms``): the true
   CoM field is a gradient field. Rotating a 2-D field by theta transforms
   its curl as  curl' = cos(theta) * curl + sin(theta) * div,  so the RMS
   curl over theta is a single-harmonic quadratic form whose minimum is
   CLOSED FORM — no grid search. The 180-degree branch (curl is invariant
   under theta+pi, which negates the field) is resolved physically, in
   THIS framework's measured-CoM convention (what ``icom_reconstruct``
   consumes; quirk #14's listed-coordinate reflection): M(R) =
   (1/2pi)(grad phi)(c - R) = -(1/2pi) grad_R[phi(c - R)], phi positive
   at (attractive) atoms — the correct branch is the one whose
   Fourier-integrated scalar field has NEGATIVE skewness.
2. **Descan** (`fit_descan`, `apply_descan`): imperfect beam de-scanning
   drifts the unscattered disk linearly with scan position. Fitting the
   LINEAR-in-scan component of the CoM field (least squares) and removing
   it preserves the local DPC signal — subtracting each pattern's own
   measured CoM would erase the physics (io/data4d.center_datacube's
   documented caveat; this module is the principled fix).
3. **Hot / dead pixels + dark / gain** (`find_bad_pixels`, `fix_pixels`,
   `apply_dark_gain`): per-pixel statistics across the whole scan expose
   stuck-bright and stuck-dead detector pixels; they are replaced with the
   local median of their good neighbors per pattern.
4. **Dose** (`estimate_dose`): electrons per square Angstrom from total
   counts and the scan pitch — the quantity the Poisson-aware
   reconstructions (`msp_reconstruct(poisson=...)`) and
   `detectors.apply_shot_noise` are parameterized by.
5. **Elliptic detector distortion** (`fit_bf_disk_ellipse`,
   `apply_elliptic_correction`, `correct_com_ellipse`): projector/lens
   distortions image the circular probe-forming aperture as an ellipse,
   skewing every |k| downstream. Fitted in closed form from the BF
   disk's second moments; corrected by an area-preserving symmetric
   resampling (patterns) or exactly (CoM fields).
6. **Affine scan distortion** (`fit_affine_scan`, `apply_affine_scan`):
   scan-coil miscalibration lands the beam at A@r instead of r. Solved
   exactly from two measured-vs-expected reciprocal lattice vectors of a
   known calibration crystal (measured peaks sit at A^T @ g).

`calibrate_datacube` chains all four with a report dict. Everything here
is plain NumPy on the host: calibration is a one-shot preprocessing pass
over data that arrived from a detector, not a TPU hot path.

The reference has no experimental-data story at all (its loaders read MD
trajectories only — /root/reference/src/io/loader.py); this subsystem is
beyond-reference, following the standard practice of the 4D-STEM analysis
literature (Savitzky et al., py4DSTEM, Microsc. Microanal. 27, 2021;
Lazic et al., iDPC, Ultramicroscopy 160, 2016).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

__all__ = [
    "com_field", "solve_rotation", "apply_rotation",
    "fit_descan", "apply_descan",
    "fit_bf_disk_ellipse", "apply_elliptic_correction", "correct_com_ellipse",
    "fit_affine_scan", "apply_affine_scan",
    "find_bad_pixels", "fix_pixels", "apply_dark_gain",
    "estimate_dose", "calibrate_datacube",
]


def com_field(data4d, kxs=None, kys=None) -> np.ndarray:
    """(2, n_sx, n_sy) center-of-mass field of a scan-grid datacube.

    ``data4d``: (n_sx, n_sy, nkx, nky). With ``kxs``/``kys`` (fftshifted
    detector axes, 1/Angstrom) the moments are physical; without, they are
    in PIXELS relative to the array center (enough for every solve here —
    rotation and descan are invariant to the k scale).
    """
    data = np.asarray(data4d, np.float64)
    nkx, nky = data.shape[-2:]
    kx = (np.asarray(kxs, np.float64) if kxs is not None
          else np.arange(nkx) - nkx // 2)
    ky = (np.asarray(kys, np.float64) if kys is not None
          else np.arange(nky) - nky // 2)
    total = data.sum(axis=(-2, -1))
    safe = np.where(total > 0, total, 1.0)
    comx = np.where(total > 0,
                    (data * kx[:, None]).sum(axis=(-2, -1)) / safe, 0.0)
    comy = np.where(total > 0,
                    (data * ky[None, :]).sum(axis=(-2, -1)) / safe, 0.0)
    return np.stack([comx, comy], axis=0)


def _curl_div_parts(com, dx, dy):
    """Central-difference gradient components of a (2, nx, ny) field."""
    gxx, gxy = np.gradient(com[0], dx, dy)
    gyx, gyy = np.gradient(com[1], dx, dy)
    return gxx, gxy, gyx, gyy


def _integrate_field(com, dx, dy) -> np.ndarray:
    """Fourier integration of a (2, nx, ny) vector field into the scalar
    field it is (approximately) the gradient of (DC set to 0)."""
    n_sx, n_sy = com.shape[1:]
    qx = np.fft.fftfreq(n_sx, d=dx)[:, None]
    qy = np.fft.fftfreq(n_sy, d=dy)[None, :]
    q2 = qx ** 2 + qy ** 2
    q2[0, 0] = 1.0
    mx, my = np.fft.fft2(com[0]), np.fft.fft2(com[1])
    h_hat = (qx * mx + qy * my) / (2j * np.pi * q2)
    h_hat[0, 0] = 0.0
    return np.real(np.fft.ifft2(h_hat))


def solve_rotation(com, dx: float = 1.0, dy: float = 1.0,
                   assume_attractive: bool = True) -> dict:
    """Solve the scan<->detector rotation (and transpose) from the CoM
    field's conservativeness.

    For each transpose hypothesis the RMS curl of the theta-rotated field
    is  f(theta) = <(cos(theta) C + sin(theta) D)^2>  with C/D the curl
    and divergence of the raw field — minimized in closed form. The
    theta / theta+pi branch is chosen so the Fourier-integrated scalar
    field has NEGATIVE skewness — the attractive-potential sign in this
    framework's measured convention, M = -(1/2pi) grad_R[phi(c - R)] with
    phi positive at atoms (``assume_attractive=True``); set False to get
    the raw curl-minimizing branch in [0, pi).

    Args:
        com: (2, n_sx, n_sy) CoM field (``com_field`` output).
        dx/dy: scan pitches (any consistent unit).

    Returns dict with ``theta`` (radians — apply with ``apply_rotation``),
    ``transpose`` (bool: detector axes swapped), ``curl_rms`` (at the
    optimum, normalized by the gradient RMS), ``curl_rms_raw`` (before
    correction), ``skewness`` (the normalized branch statistic in [-1, 1];
    |skewness| << 1 means the 180-degree branch is not determined by the
    data), and ``candidates`` (all four (theta, transpose, rms)).
    """
    com = np.asarray(com, np.float64)
    results = []
    for transpose in (False, True):
        m = np.stack([com[1], com[0]]) if transpose else com
        gxx, gxy, gyx, gyy = _curl_div_parts(m, dx, dy)
        c = gyx - gxy                       # curl of the raw field
        d = gxx + gyy                       # divergence
        a, b, cc = float(np.mean(c * c)), float(np.mean(c * d)), \
            float(np.mean(d * d))
        # f(theta) = (a+cc)/2 + (a-cc)/2 cos 2theta + b sin 2theta
        th0 = 0.5 * np.arctan2(2 * b, a - cc)
        for th in (th0, th0 + np.pi / 2):
            rms2 = ((a + cc) / 2 + (a - cc) / 2 * np.cos(2 * th)
                    + b * np.sin(2 * th))
            results.append((float(th % np.pi), transpose,
                            float(max(rms2, 0.0))))
    results.sort(key=lambda r: r[2])
    theta, transpose, rms2 = results[0]

    m = np.stack([com[1], com[0]]) if transpose else com
    grad_rms = float(np.sqrt(np.mean(
        np.square(np.stack(_curl_div_parts(m, dx, dy))))))
    gxx, gxy, gyx, gyy = _curl_div_parts(m, dx, dy)
    raw_curl_rms = float(np.sqrt(np.mean((gyx - gxy) ** 2))
                         / (grad_rms + 1e-30))

    if assume_attractive:
        best = apply_rotation(com, theta, transpose)
        h = _integrate_field(best, dx, dy)
        hc = h - h.mean()
        skew = float(np.mean(hc ** 3)
                     / (np.mean(np.abs(hc) ** 3) + 1e-300))
        # _integrate_field returns psi with M = +grad(psi)/2pi; the
        # measured convention is M = -grad(h)/2pi with h positive-skewed,
        # i.e. psi = -h must be negative-skewed. |skew| << 1 means the
        # field is near-sinusoidal (dense lattice blurred to a sine) and
        # the branch is NOT determined by the data — check the reported
        # ``skewness`` before trusting the 180-degree branch.
        if skew > 0:
            theta = float((theta + np.pi) % (2 * np.pi))
    else:
        skew = None

    return dict(theta=theta, transpose=transpose, skewness=skew,
                curl_rms=float(np.sqrt(rms2) / (grad_rms + 1e-30)),
                curl_rms_raw=raw_curl_rms,
                candidates=[dict(theta=t, transpose=tr,
                                 curl_rms=float(np.sqrt(r)
                                                / (grad_rms + 1e-30)))
                            for t, tr, r in results])


def apply_rotation(com, theta: float, transpose: bool = False) -> np.ndarray:
    """Rotate (and optionally de-transpose) a CoM field into scan
    coordinates: the inverse of the instrument's mounting transform, as
    solved by ``solve_rotation``."""
    com = np.asarray(com, np.float64)
    if transpose:
        com = np.stack([com[1], com[0]])
    ct, st = np.cos(theta), np.sin(theta)
    return np.stack([ct * com[0] - st * com[1],
                     st * com[0] + ct * com[1]])


def fit_descan(com, scan_xs, scan_ys) -> dict:
    """Least-squares linear-in-scan drift of the CoM field.

    Fits ``com[i](sx, sy) ~ c0 + cx*sx + cy*sy`` per component and
    returns ``coeffs`` ((2, 3): [offset, d/dsx, d/dsy] for comx and comy),
    ``corrected`` (the field with ONLY the fitted linear part removed —
    the constant offset c0 is descan/mistilt too and is removed with it),
    and ``drift_rms`` (how much was removed). Removing a global linear
    ramp costs only the (unmeasurable) uniform-field component of the
    specimen signal; every local feature survives.
    """
    com = np.asarray(com, np.float64)
    sx = np.asarray(scan_xs, np.float64)
    sy = np.asarray(scan_ys, np.float64)
    gx, gy = np.meshgrid(sx, sy, indexing="ij")
    A = np.stack([np.ones(gx.size), gx.ravel(), gy.ravel()], axis=1)
    coeffs = np.empty((2, 3))
    corrected = np.empty_like(com)
    for i in range(2):
        sol, *_ = np.linalg.lstsq(A, com[i].ravel(), rcond=None)
        coeffs[i] = sol
        corrected[i] = com[i] - (A @ sol).reshape(com[i].shape)
    drift = com - corrected
    return dict(coeffs=coeffs, corrected=corrected,
                drift_rms=float(np.sqrt(np.mean(drift ** 2))))


def apply_descan(data4d, coeffs, scan_xs, scan_ys, k_per_pixel,
                 subpixel: bool = True) -> np.ndarray:
    """Shift every pattern by MINUS the fitted linear descan drift.

    ``coeffs``: the (2, 3) fit from ``fit_descan`` in the same k units as
    the CoM field it was fitted on; ``k_per_pixel`` converts them to
    detector pixels — a scalar, or a (kx, ky) pair for anisotropic
    detector sampling (non-square boxes; pass 1.0 when the CoM was
    computed in pixel units).
    ``subpixel=True`` shifts via the Fourier phase ramp (exact for
    band-limited patterns); False rolls by the nearest integer. Only the
    FITTED drift is removed — per-pattern measured shifts would absorb
    the DPC signal (see module docstring).
    """
    data = np.asarray(data4d, np.float64)
    n_sx, n_sy, nkx, nky = data.shape
    sx = np.asarray(scan_xs, np.float64)
    sy = np.asarray(scan_ys, np.float64)
    kpp = np.broadcast_to(np.asarray(k_per_pixel, np.float64), (2,))
    gx, gy = np.meshgrid(sx, sy, indexing="ij")
    shift_x = -(coeffs[0, 0] + coeffs[0, 1] * gx + coeffs[0, 2] * gy) \
        / kpp[0]
    shift_y = -(coeffs[1, 0] + coeffs[1, 1] * gx + coeffs[1, 2] * gy) \
        / kpp[1]
    out = np.empty_like(data)
    if subpixel:
        fx = np.fft.fftfreq(nkx)[:, None]
        fy = np.fft.fftfreq(nky)[None, :]
        for i in range(n_sx):
            # per scan row: one vectorized Fourier shift
            ramp = np.exp(-2j * np.pi
                          * (fx[None] * shift_x[i][:, None, None]
                             + fy[None] * shift_y[i][:, None, None]))
            out[i] = np.real(np.fft.ifft2(np.fft.fft2(data[i]) * ramp))
        np.clip(out, 0.0, None, out=out)
    else:
        for i in range(n_sx):
            for j in range(n_sy):
                out[i, j] = np.roll(data[i, j],
                                    (int(round(shift_x[i, j])),
                                     int(round(shift_y[i, j]))),
                                    axis=(0, 1))
    return out


def fit_bf_disk_ellipse(pattern, threshold: float = 0.5) -> dict:
    """Elliptic distortion of the bright-field disk from one (typically
    scan-mean) diffraction pattern — the py4DSTEM-standard elliptic
    calibration (Savitzky et al. 2021, section "elliptical distortions").

    Projector/lens distortions image the circular probe-forming aperture
    as an ellipse; every |k| in downstream analysis (virtual detectors,
    radial profiles, dispersion k paths) inherits that error. The disk is
    segmented at ``threshold`` x the (median-smoothed) maximum and fitted
    by SECOND MOMENTS — closed form, no iterative edge fit, robust to
    counting noise. The axis RATIO, angle and center come from
    intensity-weighted moments over the (dilated) disk region, which are
    insensitive to edge pixelation; the absolute scale comes from the
    segmented area (pi*a*b = N_pixels).

    Returns dict with ``center`` (pixels), ``semi_axes`` (a >= b,
    pixels), ``angle`` (radians, major axis vs +x), ``ellipticity``
    (a/b >= 1), and ``correction`` — the area-preserving symmetric 2x2
    matrix C with C @ (k - center) circular (radius sqrt(a*b)). Apply
    with ``apply_elliptic_correction`` (patterns) or
    ``correct_com_ellipse`` (CoM fields).
    """
    from scipy.ndimage import binary_dilation, label, median_filter

    p = np.asarray(pattern, np.float64)
    smooth = median_filter(p, size=3, mode="nearest")
    if not float(smooth.max()) > 0:
        raise ValueError(
            "bright-field disk segmentation found fewer than 9 pixels — "
            "the pattern has no positive intensity")
    mask = smooth >= threshold * float(smooth.max())
    # keep only the component containing the brightest pixel (stray Bragg
    # spots above threshold must not skew the moments)
    lab, _ = label(mask)
    peak = np.unravel_index(np.argmax(smooth), smooth.shape)
    mask = lab == lab[peak]
    if mask.sum() < 9:
        raise ValueError(
            "bright-field disk segmentation found fewer than 9 pixels — "
            f"threshold {threshold} is likely wrong for this pattern")
    # intensity-weighted moments over the disk + its soft edge (dilation
    # keeps stray far-field features out while the sub-pixel edge profile
    # stays in — a binary mask alone is pixelation-limited to ~2-5%)
    w = np.where(binary_dilation(mask, iterations=3), smooth, 0.0)
    gx, gy = np.meshgrid(np.arange(p.shape[0], dtype=np.float64),
                         np.arange(p.shape[1], dtype=np.float64),
                         indexing="ij")
    wsum = w.sum()
    center = np.array([(gx * w).sum(), (gy * w).sum()]) / wsum
    dxc, dyc = gx - center[0], gy - center[1]
    cov = np.array([[(dxc * dxc * w).sum(), (dxc * dyc * w).sum()],
                    [(dxc * dyc * w).sum(), (dyc * dyc * w).sum()]]) / wsum
    evals, evecs = np.linalg.eigh(cov)       # ascending
    ratio = float(np.sqrt(evals[1] / evals[0]))     # a/b
    # absolute scale from the segmented area: pi*a*b = N_pixels
    r0 = float(np.sqrt(mask.sum() / np.pi))         # sqrt(a*b)
    a = r0 * np.sqrt(ratio)
    b = r0 / np.sqrt(ratio)
    major = evecs[:, 1]
    angle = float(np.arctan2(major[1], major[0]) % np.pi)
    R = np.array([[np.cos(angle), -np.sin(angle)],
                  [np.sin(angle), np.cos(angle)]])
    C = R @ np.diag([r0 / a, r0 / b]) @ R.T
    return dict(center=center, semi_axes=(float(a), float(b)),
                angle=angle, ellipticity=float(a / b), correction=C,
                n_pixels=int(mask.sum()))


def apply_elliptic_correction(data4d, ellipse: dict, order: int = 1
                              ) -> np.ndarray:
    """Resample every pattern so the fitted ellipse becomes a circle.

    Output pattern P'(k) = P(Cinv @ (k - c) + c) with C =
    ``ellipse['correction']`` (area-preserving, so total counts are
    conserved up to interpolation). ``order``: spline order for
    ``scipy.ndimage.map_coordinates`` (1 = bilinear — sharp diffraction
    features ring at higher orders).
    """
    from scipy.ndimage import map_coordinates

    data = np.asarray(data4d, np.float64)
    shape = data.shape
    flat = data.reshape(-1, *shape[-2:])
    nkx, nky = shape[-2:]
    c = np.asarray(ellipse["center"], np.float64)
    Cinv = np.linalg.inv(np.asarray(ellipse["correction"], np.float64))
    gx, gy = np.meshgrid(np.arange(nkx), np.arange(nky), indexing="ij")
    out_k = np.stack([gx.ravel() - c[0], gy.ravel() - c[1]])   # (2, nk^2)
    src = Cinv @ out_k + c[:, None]
    out = np.empty_like(flat)
    for i in range(flat.shape[0]):
        out[i] = map_coordinates(flat[i], src, order=order,
                                 mode="nearest").reshape(nkx, nky)
    return out.reshape(shape)


def correct_com_ellipse(com, ellipse: dict) -> np.ndarray:
    """Exact (algebraic) elliptic correction of a CoM field: under the
    area-preserving change of detector coordinates k -> C k, first moments
    transform linearly, com' = C @ com — no resampling loss."""
    C = np.asarray(ellipse["correction"], np.float64)
    com = np.asarray(com, np.float64)
    return np.einsum("ij,j...->i...", C, com)


def fit_affine_scan(image, scan_xs, scan_ys, g_expected,
                    search_frac: float = 0.2) -> dict:
    """Affine scan distortion from a known lattice (py4DSTEM-standard
    "scan distortion" calibration).

    Model: the beam actually lands at ``A @ r`` when the scan electronics
    report ``r`` (A a 2x2 near-identity matrix; any translation is an
    irrelevant origin shift). A lattice image with TRUE reciprocal
    vectors g then shows MEASURED Fourier peaks at g_m = A^T @ g, so two
    independent measured/expected pairs determine A = (G_m @ G_i^-1)^T
    exactly.

    Args:
        image: (n_sx, n_sy) real-space reference image on the scan grid —
            e.g. a virtual BF/ADF image of a known calibration crystal.
        scan_xs/scan_ys: scan coordinates (Angstrom, uniform pitch).
        g_expected: (2, 2) TRUE reciprocal lattice vectors as rows
            (1/Angstrom) — from the known crystal structure.
        search_frac: each measured peak is searched within this fraction
            of |g| around its expected position.

    Returns dict with ``A`` (the distortion; ``apply_affine_scan``
    resamples with its inverse), ``g_measured`` (2, 2), ``peak_snr``
    (per peak: peak power over the local median power), and
    ``determinant`` (pixel-area change — 1.0 means pure shear/rotation).
    """
    img = np.asarray(image, np.float64)
    sx = np.asarray(scan_xs, np.float64)
    sy = np.asarray(scan_ys, np.float64)
    dx = float(sx[1] - sx[0])
    dy = float(sy[1] - sy[0])
    # Hann window: the scan field is not periodic, and the window's
    # smooth ~2-bin peaks make the 3x3 power centroid an accurate
    # sub-bin estimator (a bare off-bin sinusoid's leakage skews it).
    wx = np.hanning(img.shape[0])[:, None]
    wy = np.hanning(img.shape[1])[None, :]
    F = np.abs(np.fft.fft2((img - img.mean()) * wx * wy)) ** 2
    qx = np.fft.fftfreq(img.shape[0], d=dx)
    qy = np.fft.fftfreq(img.shape[1], d=dy)

    g_exp = np.asarray(g_expected, np.float64).reshape(2, 2)
    g_meas = np.empty((2, 2))
    snrs = []
    for i, g in enumerate(g_exp):
        r = search_frac * float(np.linalg.norm(g))
        near = ((qx[:, None] - g[0]) ** 2
                + (qy[None, :] - g[1]) ** 2) <= r * r
        if not near.any():
            raise ValueError(
                f"expected peak {g} has no Fourier samples within "
                f"{search_frac:.0%} of |g| — scan field of view too small "
                "or wrong lattice vectors")
        Fm = np.where(near, F, 0.0)
        px, py = np.unravel_index(np.argmax(Fm), F.shape)
        snrs.append(float(F[px, py] / (np.median(F[near]) + 1e-300)))
        # subpixel: power-weighted centroid over the 3x3 neighborhood
        # (wrapping at the FFT edges)
        ix = (px + np.arange(-1, 2)) % F.shape[0]
        iy = (py + np.arange(-1, 2)) % F.shape[1]
        w = F[np.ix_(ix, iy)]
        wx = float((w.sum(axis=1) * np.arange(-1, 2)).sum() / w.sum())
        wy = float((w.sum(axis=0) * np.arange(-1, 2)).sum() / w.sum())
        dqx = qx[1] - qx[0]
        dqy = qy[1] - qy[0]
        g_meas[i] = (qx[px] + wx * dqx, qy[py] + wy * dqy)

    A = (g_meas.T @ np.linalg.inv(g_exp.T)).T
    return dict(A=A, g_measured=g_meas, peak_snr=snrs,
                determinant=float(np.linalg.det(A)))


def apply_affine_scan(data, A, scan_xs, scan_ys, order: int = 1
                      ) -> np.ndarray:
    """Resample the scan axes to undo a fitted affine distortion.

    Output at reported coordinate r holds the value the beam ACTUALLY
    produced there: out(r) = in(A^-1 @ r), sampled relative to the scan
    origin (scan_xs[0], scan_ys[0]). Works on a (n_sx, n_sy) image or a
    (n_sx, n_sy, nkx, nky) datacube (patterns move rigidly with their
    scan position; out-of-field samples clamp to the edge).
    """
    from scipy.ndimage import map_coordinates

    arr = np.asarray(data, np.float64)
    n_sx, n_sy = arr.shape[:2]
    sx = np.asarray(scan_xs, np.float64)
    sy = np.asarray(scan_ys, np.float64)
    dx = float(sx[1] - sx[0])
    dy = float(sy[1] - sy[0])
    Ainv = np.linalg.inv(np.asarray(A, np.float64))
    gx, gy = np.meshgrid(np.arange(n_sx) * dx, np.arange(n_sy) * dy,
                         indexing="ij")
    src = Ainv @ np.stack([gx.ravel(), gy.ravel()])
    coords = np.stack([src[0] / dx, src[1] / dy])
    if arr.ndim == 2:
        return map_coordinates(arr, coords, order=order,
                               mode="nearest").reshape(n_sx, n_sy)
    flat = arr.reshape(n_sx, n_sy, -1)
    out = np.empty_like(flat)
    for j in range(flat.shape[-1]):
        out[:, :, j] = map_coordinates(flat[:, :, j], coords, order=order,
                                       mode="nearest").reshape(n_sx, n_sy)
    return out.reshape(arr.shape)


def find_bad_pixels(data4d, n_sigma: float = 8.0) -> np.ndarray:
    """(nkx, nky) bool mask of hot/dead detector pixels.

    Statistics across ALL scan positions. Sharp physical features (single-
    pixel Bragg spots, the quasi-stable unscattered-beam core) also deviate
    from their spatial neighbors, so a mean-outlier rule alone misfires on
    diffraction data; the discriminator is that a defect does not FOLLOW
    THE SCAN: a stuck pixel's relative scan-variation (std/mean) is
    essentially zero, while any physical pixel in measured (shot-noise)
    data varies at least at the Poisson level 1/sqrt(N). A pixel is
    flagged when

    * its scan-variation is below ``stuck_tol`` relative (exactly-stuck
      defects) AND its scan-mean deviates from the 3x3 local median of the
      mean pattern by more than ``n_sigma`` robust (MAD) sigmas; or
    * it never varies at all while its neighborhood does (stuck pixels,
      including stuck-at-zero inside the illuminated region).

    Fluctuating dark-current hot pixels (high mean, Poisson-varying) are
    NOT targeted here — remove those with measured dark/gain frames via
    ``apply_dark_gain`` first.
    """
    from scipy.ndimage import median_filter

    stuck_tol = 1e-6
    data = np.asarray(data4d, np.float64).reshape(
        -1, *np.asarray(data4d).shape[-2:])
    mean = data.mean(axis=0)
    local = median_filter(mean, size=3, mode="nearest")
    resid = mean - local
    mad = np.median(np.abs(resid - np.median(resid)))
    sigma = 1.4826 * mad + 1e-12
    suspicious = np.abs(resid) > n_sigma * sigma

    std = data.std(axis=0)
    stuck_ish = std <= stuck_tol * (np.abs(mean) + 1e-12)

    var = data.var(axis=0)
    local_var = median_filter(var, size=3, mode="nearest")
    return (suspicious & stuck_ish & (local_var > 0)) \
        | ((var == 0) & (local_var > 0))


def fix_pixels(data4d, bad_mask) -> np.ndarray:
    """Replace bad pixels with the per-pattern median of their good
    3x3 neighbors (edge pixels use their in-bounds neighbors)."""
    data = np.array(data4d, np.float64, copy=True)
    shape = data.shape
    flat = data.reshape(-1, *shape[-2:])
    bad = np.asarray(bad_mask, bool)
    nkx, nky = bad.shape
    for x, y in zip(*np.nonzero(bad)):
        xs = slice(max(x - 1, 0), min(x + 2, nkx))
        ys = slice(max(y - 1, 0), min(y + 2, nky))
        nb_bad = bad[xs, ys].ravel()
        nb = flat[:, xs, ys].reshape(flat.shape[0], -1)[:, ~nb_bad]
        if nb.shape[1] == 0:     # isolated in a bad cluster: global median
            nb = flat.reshape(flat.shape[0], -1)
        flat[:, x, y] = np.median(nb, axis=1)
    return flat.reshape(shape)


def apply_dark_gain(data4d, dark=None, gain=None) -> np.ndarray:
    """Counts -> electrons: (data - dark) / gain per detector pixel,
    clipped at 0. ``gain`` pixels <= 0 are treated as dead (output 0);
    flag them via ``find_bad_pixels``/``fix_pixels`` afterwards."""
    data = np.asarray(data4d, np.float64)
    if dark is not None:
        data = data - np.asarray(dark, np.float64)[None]
    if gain is not None:
        g = np.asarray(gain, np.float64)
        safe = np.where(g > 0, g, 1.0)
        data = np.where(g[None] > 0, data / safe[None], 0.0)
    return np.clip(data, 0.0, None)


def estimate_dose(data4d, scan_step: float,
                  scan_step_y: Optional[float] = None) -> dict:
    """Dose statistics assuming calibrated electron counts.

    Returns ``dose`` (mean electrons per Angstrom^2),
    ``electrons_per_position`` (scan-shaped array), and ``total``.
    ``scan_step`` (/``scan_step_y``) in Angstrom.
    """
    data = np.asarray(data4d, np.float64)
    per_pos = data.sum(axis=(-2, -1))
    area = float(scan_step) * float(scan_step_y if scan_step_y is not None
                                    else scan_step)
    return dict(dose=float(per_pos.mean() / area),
                electrons_per_position=per_pos,
                total=float(per_pos.sum()))


def calibrate_datacube(data4d, scan_xs, scan_ys, dark=None, gain=None,
                       n_sigma: float = 8.0, k_per_pixel=1.0,
                       kxs=None, kys=None,
                       assume_attractive: bool = True,
                       subpixel_descan: bool = False,
                       fit_ellipse: bool = True,
                       apply_ellipse: bool = False,
                       g_expected=None,
                       apply_affine: bool = False) -> dict:
    """One-shot calibration chain for a measured scan-grid datacube:

        dark/gain -> bad pixels -> beam centering -> elliptic-distortion
        fit [-> correction] -> descan fit+removal -> rotation/transpose
        solve [-> affine scan-distortion fit/correction]

    Args:
        data4d: (n_sx, n_sy, nkx, nky) raw counts.
        scan_xs/scan_ys: scan coordinates (Angstrom).
        k_per_pixel: detector k sampling if known (`k_sampling_from_disk`)
            — scalar or (kx, ky) pair. NOT merely cosmetic: anisotropic
            detectors (non-square boxes) need the true per-axis scale or
            the rotation solve sees a sheared field.
        kxs/kys: fftshifted physical detector axes (1/Angstrom, e.g.
            WFData.kxs/kys) — the preferred calibration source; overrides
            ``k_per_pixel``.

    Returns dict with ``data`` (calibrated cube — pattern-level
    corrections applied: dark/gain, bad pixels, centering, descan),
    ``com`` (calibrated CoM field in scan coordinates — THE deflection
    product; descan and rotation are exact field-level corrections there,
    feed it to ``icom_reconstruct(com=...)``), ``rotation`` (radians),
    ``transpose``, ``bad_pixels``, ``beam_center_shift``, ``descan``
    (fit dict), ``ellipse`` (fit dict or None), ``affine`` (fit dict or
    None), ``dose``, and ``report`` (one line per step).

    ``subpixel_descan``: pattern-level descan correction mode. The default
    (False) rolls by the nearest integer pixel — LOSSLESS; sub-pixel
    Fourier shifts ring badly on razor-sharp diffraction features and can
    swamp weak-phase deflection signals (which live at the milli-pixel
    scale), so they are opt-in for smooth measured patterns. The ``com``
    field is corrected exactly (algebraically) either way — deflection
    analyses should consume it, not re-measure the shifted patterns.

    ``fit_ellipse``: fit the bright-field disk's elliptic distortion on
    the scan-mean pattern (``fit_bf_disk_ellipse``) and report the
    ellipticity. ``apply_ellipse=True`` additionally circularizes every
    pattern by resampling (bilinear — slightly lossy, so opt-in; the
    ``com`` field is then corrected algebraically, which is exact).

    ``g_expected``: (2, 2) TRUE reciprocal lattice vectors (rows,
    1/Angstrom) of a known calibration crystal — when given, the affine
    scan distortion is fitted from the virtual (total-counts) image
    (``fit_affine_scan``) and reported; ``apply_affine=True`` resamples
    the cube's scan axes with the inverse.
    """
    from ..io.data4d import center_datacube

    report = []
    data = np.asarray(data4d, np.float64)
    if dark is not None or gain is not None:
        data = apply_dark_gain(data, dark, gain)
        report.append("dark/gain applied")
    bad = find_bad_pixels(data, n_sigma=n_sigma)
    if bad.any():
        data = fix_pixels(data, bad)
    report.append(f"bad pixels fixed: {int(bad.sum())}")

    data, (cdx, cdy) = center_datacube(data, return_shift=True)
    report.append(f"beam centered: rolled ({cdx}, {cdy}) px")

    ellipse = None
    data_pre_ellipse = None
    if fit_ellipse:
        try:
            ellipse = fit_bf_disk_ellipse(data.mean(axis=(0, 1)))
            report.append(
                f"BF disk ellipticity {ellipse['ellipticity']:.4f} "
                f"(major axis {np.degrees(ellipse['angle']):.1f} deg)"
                + (", corrected" if apply_ellipse else ""))
            if apply_ellipse:
                data_pre_ellipse = data        # exact CoM source
                data = apply_elliptic_correction(data, ellipse)
        except ValueError as e:
            report.append(f"ellipse fit skipped: {e}")

    # CoM from the pre-resampling cube (interpolation-free); the elliptic
    # correction is then applied to it ALGEBRAICALLY (exact), conjugated
    # into physical k units when the detector pixels are anisotropic.
    com_src = data if data_pre_ellipse is None else data_pre_ellipse
    if kxs is not None and kys is not None:
        com = com_field(com_src, kxs, kys)
        kpp = np.array([float(np.asarray(kxs)[1] - np.asarray(kxs)[0]),
                        float(np.asarray(kys)[1] - np.asarray(kys)[0])])
    else:
        kpp = np.broadcast_to(np.asarray(k_per_pixel, np.float64), (2,))
        com = com_field(com_src) * kpp[:, None, None]
    if ellipse is not None and apply_ellipse:
        S = np.diag(kpp)
        C_phys = S @ ellipse["correction"] @ np.linalg.inv(S)
        com = np.einsum("ij,j...->i...", C_phys, com)
    descan = fit_descan(com, scan_xs, scan_ys)
    data = apply_descan(data, descan["coeffs"], scan_xs, scan_ys,
                        kpp, subpixel=subpixel_descan)
    com = descan["corrected"]
    report.append(f"descan removed: drift RMS {descan['drift_rms']:.3g}")

    dx = float(scan_xs[1] - scan_xs[0]) if len(scan_xs) > 1 else 1.0
    dy = float(scan_ys[1] - scan_ys[0]) if len(scan_ys) > 1 else 1.0
    rot = solve_rotation(com, dx, dy, assume_attractive=assume_attractive)
    com = apply_rotation(com, rot["theta"], rot["transpose"])
    report.append(
        f"rotation {np.degrees(rot['theta']):.2f} deg, transpose "
        f"{rot['transpose']} (curl RMS {rot['curl_rms_raw']:.3g} -> "
        f"{rot['curl_rms']:.3g})")

    affine = None
    if g_expected is not None:
        try:
            affine = fit_affine_scan(data.sum(axis=(-2, -1)),
                                     scan_xs, scan_ys, g_expected)
            off = float(np.max(np.abs(affine["A"] - np.eye(2))))
            report.append(
                f"affine scan distortion: max|A - I| = {off:.3g}, "
                f"det {affine['determinant']:.4f}"
                + (", corrected" if apply_affine else ""))
            if apply_affine:
                data = apply_affine_scan(data, affine["A"],
                                         scan_xs, scan_ys)
                com = np.stack([
                    apply_affine_scan(com[0], affine["A"],
                                      scan_xs, scan_ys),
                    apply_affine_scan(com[1], affine["A"],
                                      scan_xs, scan_ys)])
        except ValueError as e:
            report.append(f"affine scan fit skipped: {e}")

    dose = estimate_dose(data, dx, dy)
    report.append(f"dose ~ {dose['dose']:.3g} e/A^2")
    return dict(data=data, com=com, rotation=rot["theta"],
                transpose=rot["transpose"], rotation_diag=rot,
                bad_pixels=bad, beam_center_shift=(cdx, cdy),
                descan=descan, ellipse=ellipse, affine=affine,
                dose=dose, report=report)

"""PRISM-style scattering-matrix STEM (beyond-reference).

For scans with many probe positions the direct path propagates every probe
through the specimen. But multislice is LINEAR in the incident wave, and
every aperture-limited probe is a small set of plane waves:

    probe(r; r0) = (1/Npix) sum_{kappa in aperture} e^{2pi i kappa.(s + r0)}
                   * e^{2pi i kappa.r}

(s is the ifftshift centering offset — this is exactly
physics.probe.probe_array + shift_probes, verified by test). So:

  1. Propagate the plane-wave BASIS through the potential once per frame:
     S[kappa] = multislice(e^{2pi i kappa.r}) — the scattering matrix.
  2. Synthesize any probe's exit wave as one (P, Nb) @ (Nb, npix) complex
     matmul — an MXU-native contraction, thousands of times cheaper than a
     propagation.

Cost crossover: direct ~ n_probes propagations/frame; S-matrix ~ n_beams.
At f=1 (all aperture beams) the synthesis is EXACT but n_beams can exceed
n_probes; the PRISM interpolation factor ``f`` keeps every f-th beam index
per axis (n_beams/f^2), making the incident probe periodic with period
(lx/f, ly/f) — accurate while the probe stays compact inside that window
(Ophus, Adv Struct Chem Imaging 3:13, 2017). Typical STEM: f=4-8 beams
~ hundreds, scans ~ thousands of probes -> ~P f^2 / N_ap speedup of the
propagation stage.

The reference has no S-matrix path (it batch-propagates every probe,
multislice.py:198-235); abTEM/py4DSTEM ship PRISM for exactly this regime.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.constants import wavelength as _wavelength
from ..core.dtypes import Precision, get_precision
from ..ops import matfft
from ..physics.potential import RasterizerPlan, rasterize
from ..physics.propagate import multislice


@dataclasses.dataclass(frozen=True)
class BeamSet:
    """Aperture plane-wave basis: physical k values and the synthesis
    phase offset (the probe-centering ifftshift translation)."""
    kxb: np.ndarray          # (Nb,) 1/Angstrom
    kyb: np.ndarray          # (Nb,)
    shift: Tuple[float, float]   # s = (nx//2 * dx, ny//2 * dy)
    f: int
    mrad: float
    eV: float

    @property
    def n_beams(self) -> int:
        return len(self.kxb)


def build_beams(xs, ys, mrad: float, eV: float, f: int = 1) -> BeamSet:
    """Plane-wave k-points inside the aperture, every f-th fftfreq index
    per axis (PRISM interpolation factor; f=1 keeps all -> exact).

    Subsampling k by f periodizes the incident probe with period
    (lx/f, ly/f) at amplitude 1/f^2 per replica (Poisson summation); the
    synthesis stage crops one replica's window and rescales by f^2, so f
    must divide both grid extents."""
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    nx, ny = len(xs), len(ys)
    if nx % f or ny % f:
        raise ValueError(f"PRISM factor f={f} must divide the grid "
                         f"({nx}x{ny}) for clean probe windows")
    if mrad <= 0:
        raise ValueError(
            "the S-matrix path needs a convergent probe (mrad > 0); "
            "plane-wave workloads have one incident wave — use the direct "
            "pipeline")
    dx, dy = float(xs[1] - xs[0]), float(ys[1] - ys[0])
    lam = _wavelength(eV)
    q_ap = (mrad * 1e-3) / lam
    kxs = np.fft.fftfreq(nx, d=dx)
    kys = np.fft.fftfreq(ny, d=dy)
    ix = np.arange(nx) % f == 0
    iy = np.arange(ny) % f == 0
    kxg, kyg = np.meshgrid(kxs[ix], kys[iy], indexing="ij")
    inside = (kxg ** 2 + kyg ** 2) < q_ap ** 2
    return BeamSet(kxb=kxg[inside].ravel(), kyb=kyg[inside].ravel(),
                   shift=((nx // 2) * dx, (ny // 2) * dy),
                   f=int(f), mrad=float(mrad), eV=float(eV))


@dataclasses.dataclass(frozen=True, eq=False)
class SMatrix:
    """Scattering matrix for one frame (eq=False: identity-hashed).

    f == 1: ``s`` holds k-space rows fftshift(fft2(multislice(wave_b))),
    synthesis is a plain matmul, detector axes = the full k grid.
    f > 1 (PRISM): ``s`` holds REAL-space exit rows; synthesis crops the
    (nx/f, ny/f) window around each probe (replicas are lx/f apart) and
    rescales by f^2; detector axes = the window's (coarser) k grid."""
    beams: BeamSet
    s: jnp.ndarray           # (Nb, nx, ny) complex (space depends on f)
    kxs: np.ndarray          # fftshifted DETECTOR axes (window axes if f>1)
    kys: np.ndarray
    npix: int
    nx: int
    ny: int
    dx: float
    dy: float

    @property
    def window(self) -> Tuple[int, int]:
        return self.nx // self.beams.f, self.ny // self.beams.f


def _plane_waves(kxb, kyb, xs, ys, cdtype):
    phase = (2.0 * np.pi) * (kxb[:, None, None] * xs[None, :, None]
                             + kyb[:, None, None] * ys[None, None, :])
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase)).astype(cdtype)


# Measured single-chip crossover (BENCHMARKS.md, PRISM section): the
# f=1 basis build amortizes against direct propagation at ~2,000 probes
# per frame on v5e. Scan production (StreamingHAADF / frozen_phonon_haadf
# / chromatic_stem) auto-dispatches through the S-matrix above this.
SMATRIX_MIN_PROBES = 2000


def smatrix_auto(n_probes: int, mrad: float, ksq2d, nx: int, ny: int,
                 f: int = 1) -> bool:
    """Should a scan of ``n_probes`` positions route through the S-matrix?
    Needs a convergent probe, an orthogonal cell, f-divisible grid axes,
    and enough probes to amortize the basis build."""
    return (mrad > 0 and ksq2d is None
            and nx % f == 0 and ny % f == 0
            and n_probes >= SMATRIX_MIN_PROBES)


def compute_smatrix(positions, plan: RasterizerPlan, beams: BeamSet,
                    *, xs, ys, dz: float, precision: Optional[Precision] = None,
                    beam_chunk: int = 64, ksq=None, mesh=None,
                    kmax2: Optional[float] = None) -> SMatrix:
    """Propagate the beam basis through one frame's potential.

    positions: (n_atoms, 3) frame positions (rasterized with ``plan``).
    beam_chunk bounds HBM: the (chunk, nx, ny) stacks are propagated with
    lax.map over chunks.

    ``mesh``: optional ('frame', 'probe') Mesh — the basis build is
    embarrassingly parallel over beams, so the beam axis shards over ALL
    mesh devices (both axes flattened); each device propagates its beam
    subset locally with zero communication and ``sm.s`` comes back
    sharded over the beam axis (the downstream synthesis matmul contracts
    it with XLA inserting the reduction).
    """
    if ksq is not None:
        raise ValueError(
            "oblique cells are not supported by the S-matrix path: beam "
            "selection, probe coefficients, and window cropping assume an "
            "orthogonal cell (use the direct pipeline, which handles "
            "oblique metrics end-to-end)")
    prec = get_precision(precision)
    v = rasterize(jnp.asarray(positions, prec.real), plan, prec)
    nb = beams.n_beams
    f = beams.f
    xs = np.asarray(xs)
    ys = np.asarray(ys)
    nx, ny = len(xs), len(ys)
    dx, dy = float(xs[1] - xs[0]), float(ys[1] - ys[0])
    # balance the chunks: ceil-split nb into the fewest <=beam_chunk
    # pieces so at most ceil(nb/chunk)-1 dummy beams get propagated
    # (naive nb->multiple-of-beam_chunk padding could nearly double the
    # build for nb just over a multiple).
    n_chunks = -(-nb // max(1, min(beam_chunk, nb)))
    if mesh is not None:
        # beam-parallel build: the chunk axis shards over ALL devices
        n_chunks = -(-n_chunks // mesh.size) * mesh.size
    chunk = -(-nb // n_chunks)
    pad = n_chunks * chunk - nb
    kxb = np.concatenate([beams.kxb, np.zeros(pad)]).astype(np.float64)
    kyb = np.concatenate([beams.kyb, np.zeros(pad)]).astype(np.float64)
    kxs = np.fft.fftfreq(nx, d=dx)
    kys = np.fft.fftfreq(ny, d=dy)

    xs_r = jnp.asarray(xs, prec.real)
    ys_r = jnp.asarray(ys, prec.real)

    def one_chunk(kb, v_in):
        waves = _plane_waves(kb[0].astype(prec.real), kb[1].astype(prec.real),
                             xs_r, ys_r, prec.complex)
        out = multislice(waves, v_in, kxs, kys, eV=beams.eV, dz=dz,
                        precision=prec, ksq=ksq, kmax2=kmax2)
        if f == 1:
            out = jnp.fft.fftshift(matfft.fft2(out), axes=(-2, -1))
        return out

    kb = jnp.stack([jnp.asarray(kxb.reshape(-1, chunk)),
                    jnp.asarray(kyb.reshape(-1, chunk))], axis=1)
    if mesh is None:
        s = jax.lax.map(lambda c: one_chunk(c, v), kb)
    else:
        from jax.sharding import PartitionSpec as P
        beam_spec = P(tuple(mesh.axis_names))     # dim 0 over all devices

        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(beam_spec, P()),
                           out_specs=beam_spec)
        def build_block(kb_local, v_rep):
            return jax.lax.map(lambda c: one_chunk(c, v_rep), kb_local)

        s = jax.jit(build_block)(kb, v)
    s = s.reshape(-1, nx, ny)[:nb]
    if f == 1:
        det_kxs, det_kys = np.fft.fftshift(kxs), np.fft.fftshift(kys)
    else:
        det_kxs = np.fft.fftshift(np.fft.fftfreq(nx // f, d=dx))
        det_kys = np.fft.fftshift(np.fft.fftfreq(ny // f, d=dy))
    return SMatrix(beams=beams, s=s, kxs=det_kxs, kys=det_kys,
                   npix=nx * ny, nx=nx, ny=ny, dx=dx, dy=dy)


def probe_coefficients(beams: BeamSet, probe_positions, npix: int,
                       precision: Optional[Precision] = None,
                       aberrations=None, defocus: float = 0.0) -> jnp.ndarray:
    """(P, Nb) complex synthesis coefficients: probe(r0) = C @ basis.
    c_b(r0) = exp(2 pi i kappa_b . (s + r0)) / Npix — exactly
    probe_array + shift_probes (the 1/Npix is ifft2's normalization).

    ``aberrations`` (physics.aberrations.Aberrations or coefficient dict)
    and/or ``defocus`` (Angstrom, added to C1) imprint the aberration
    surface exp(-i chi(kappa_b)) on each coefficient. The basis is
    k-diagonal, so this is EXACT — the synthesized probe equals
    Probe(...).defocus(dz)/.aberrate(ab) + shift_probes (round-2 advisor
    finding: the ideal in-focus probe was the only representable one).
    Negative defocus uses this framework's fixed back-propagation
    semantics, not reference quirk #13's double negation."""
    prec = get_precision(precision)
    phase = coefficient_phase(beams, probe_positions,
                              aberrations=aberrations, defocus=defocus)
    phase = jnp.asarray(phase.astype(np.dtype(prec.real)))
    return _coeffs_from_phase(phase, npix=npix, cdtype=prec.complex)


def coefficient_phase(beams: BeamSet, probe_positions, aberrations=None,
                      defocus: float = 0.0) -> np.ndarray:
    """Host-side (P, Nb) float64 coefficient phases — the argument of
    probe_coefficients' complex exponential; shared with the frame-sharded
    streaming path (which reorders/pads the rows before device placement)."""
    pos = np.asarray(probe_positions, np.float64).reshape(-1, 2)
    sx, sy = beams.shift
    phase = (2.0 * np.pi) * ((pos[:, 0] + sx)[:, None] * beams.kxb[None, :]
                             + (pos[:, 1] + sy)[:, None] * beams.kyb[None, :])
    ab = _normalize_aberrations(aberrations, defocus)
    if ab is not None:
        from ..physics.aberrations import chi_phase
        lam = _wavelength(beams.eV)
        chi = chi_phase(beams.kxb ** 2 + beams.kyb ** 2,
                        beams.kxb, beams.kyb, lam=lam, ab=ab)
        phase = phase - np.asarray(chi, np.float64)[None, :]
    return phase


def _normalize_aberrations(aberrations, defocus: float):
    """Canonical Aberrations with ``defocus`` folded into C1; None if the
    combined surface is zero."""
    from ..physics.aberrations import Aberrations
    if isinstance(aberrations, dict):
        aberrations = Aberrations(**aberrations)
    if defocus:
        aberrations = dataclasses.replace(
            aberrations or Aberrations(),
            C1=(aberrations.C1 if aberrations else 0.0) + float(defocus))
    if aberrations is None or aberrations.is_zero():
        return None
    return aberrations


@functools.partial(jax.jit, static_argnames=("npix", "cdtype"))
def _coeffs_from_phase(phase, *, npix, cdtype):
    c = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    return (c / npix).astype(cdtype)


def _window_starts(sm: SMatrix, probe_positions) -> Tuple[np.ndarray,
                                                          np.ndarray]:
    """Top-left pixel of each probe's (nx/f, ny/f) replica window.

    The shifted probe for position (px, py) peaks at grid point
    (x_c - px, y_c - py) mod L — the reference's mirrored shift ramp
    (quirk #14, multislice.py:216-227), which this framework replicates
    for parity. The unshifted peak x_c sits at ceil(n/2) — ifftshift
    rolls by n//2, putting index 0 of ifft2(mask) (the peak) at
    n - n//2 — which differs from n//2 exactly on odd grids (round-2
    advisor finding: n=63 peaks at 32, not 31)."""
    return window_starts_geom(sm.nx, sm.ny, sm.dx, sm.dy, sm.beams.f,
                              probe_positions)


def window_starts_geom(nx: int, ny: int, dx: float, dy: float, f: int,
                       probe_positions) -> Tuple[np.ndarray, np.ndarray]:
    """_window_starts from bare grid geometry (no SMatrix instance) —
    shared with the frame-sharded streaming path."""
    pos = np.asarray(probe_positions, np.float64).reshape(-1, 2)
    wx, wy = nx // f, ny // f
    cx = ((nx + 1) // 2 - np.rint(pos[:, 0] / dx).astype(int)) % nx
    cy = ((ny + 1) // 2 - np.rint(pos[:, 1] / dy).astype(int)) % ny
    return (cx - wx // 2) % nx, (cy - wy // 2) % ny


@functools.partial(
    jax.jit, static_argnames=("chunk", "pad", "nx", "ny", "wx", "wy", "f",
                              "mode"))
def _run_synth(coeffs, s_flat, sx, sy, w, *, chunk, pad, nx, ny, wx, wy,
               f, mode):
    """Module-level jitted synthesis worker (re-traced only when the
    static geometry changes, not per call — a per-call jit closure here
    recompiled every invocation, ~3 s each). mode: 'exit' returns the
    synthesized k-space planes; 'amp'/'int' reduce each chunk against the
    detector weights ``w``."""
    cpad = jnp.pad(coeffs, ((0, pad), (0, 0)))
    nb = coeffs.shape[1]

    # f == 1 is an EXACTNESS contract (== direct pipeline), so its dots run
    # full-f32 (HIGHEST). f > 1 is the PRISM approximation whose window-
    # truncation error (percent-level) dwarfs bf16 rounding (~2^-8), so
    # single-pass DEFAULT dots are free accuracy-wise and ~3x fewer MXU
    # passes on the dominant synthesis matmul.
    dot_prec = (jax.lax.Precision.HIGHEST if f == 1
                else jax.lax.Precision.DEFAULT)

    def one(args):
        c = args[0]
        e = jnp.matmul(c, s_flat, precision=dot_prec)
        e = e.reshape(-1, nx, ny)
        if f > 1:
            # wrap-pad once, then output-sized dynamic slices — a per-probe
            # roll would rewrite the full plane per probe (64x the bytes).
            e = jnp.pad(e, ((0, 0), (0, wx), (0, wy)), mode="wrap")

            def crop(wv, ax, ay):
                return jax.lax.dynamic_slice(wv, (ax, ay), (wx, wy)) \
                    * (f * f)
            e = jax.vmap(crop)(e, args[1], args[2])
            e = jnp.fft.fftshift(jnp.fft.fft2(e), axes=(-2, -1))
        if mode == "exit":
            return e
        a = jnp.abs(e.reshape(e.shape[0], -1))
        if mode == "int":
            a = a * a
        return a @ w

    return jax.lax.map(one, (cpad.reshape(-1, chunk, nb),
                             sx.reshape(-1, chunk), sy.reshape(-1, chunk)))


def _synth_chunks(sm: SMatrix, probe_positions, precision, probe_chunk,
                  mode, weights=None, aberrations=None, defocus: float = 0.0):
    """Shared chunked synthesis driver: builds coefficients, dispatches
    the jitted worker, trims the padding."""
    prec = get_precision(precision)
    coeffs = probe_coefficients(sm.beams, probe_positions, sm.npix, prec,
                                aberrations=aberrations, defocus=defocus)
    p = coeffs.shape[0]
    nb = sm.beams.n_beams
    f = sm.beams.f
    chunk = max(1, min(probe_chunk, p))
    pad = (-p) % chunk
    wx, wy = sm.window
    if f > 1:
        sxa, sya = _window_starts(sm, probe_positions)
    else:
        sxa = sya = np.zeros(p, int)
    sx = jnp.asarray(np.concatenate([sxa, np.zeros(pad, int)])
                     .astype(np.int32))
    sy = jnp.asarray(np.concatenate([sya, np.zeros(pad, int)])
                     .astype(np.int32))
    w = (jnp.zeros((1,), prec.real) if weights is None
         else jnp.asarray(np.asarray(weights, np.float64).reshape(-1),
                          dtype=prec.real))
    out = _run_synth(coeffs, sm.s.reshape(nb, -1), sx, sy, w,
                     chunk=chunk, pad=pad, nx=sm.nx, ny=sm.ny,
                     wx=wx, wy=wy, f=f, mode=mode)
    return out.reshape(-1, *out.shape[2:])[:p]


def smatrix_exit_kspace(sm: SMatrix, probe_positions,
                        precision: Optional[Precision] = None,
                        probe_chunk: int = 128, aberrations=None,
                        defocus: float = 0.0) -> jnp.ndarray:
    """Synthesize fftshifted k-space exit waves for arbitrary probe
    positions. f=1: (P, nx, ny), identical to the direct pipeline's
    fftshift(fft2(multislice(shifted probes))). f>1: (P, nx/f, ny/f)
    probe-window diffraction patterns on the sm.kxs/kys axes (the PRISM
    resolution trade). CAVEAT (f>1 only): each window's crop origin is
    rint-quantized per probe, imprinting an arbitrary linear phase ramp —
    magnitudes are position-consistent, complex phases are NOT; use f=1
    for phase-sensitive work. ``aberrations``/``defocus`` shape the
    synthesized probe (exact — see probe_coefficients)."""
    return _synth_chunks(sm, probe_positions, precision, probe_chunk,
                         "exit", aberrations=aberrations, defocus=defocus)


def smatrix_reduce(sm: SMatrix, probe_positions, weights,
                   intensity: bool = False,
                   precision: Optional[Precision] = None,
                   probe_chunk: int = 128, aberrations=None,
                   defocus: float = 0.0) -> np.ndarray:
    """Detector reduction without materializing all per-probe exit waves:
    value(p) = sum_k w(k) |exit(p, k)|   (amplitude, the reference HAADF
    convention — quirk #11; ``intensity=True`` squares). ``weights`` is a
    mask/weight array on the FFTSHIFTED detector grid sm.kxs/kys (the
    window grid when f > 1).

    Memory: one (probe_chunk, npix) complex plane at a time; every chunk
    re-reads the whole S matrix, so larger chunks amortize HBM (128 x
    1024^2 complex64 = 1 GB of synthesis plane — comfortable). f > 1 values
    are calibrated to full-grid pixel sums (the window k grid carries
    1/f^2 the detector pixels at the same pattern values, so sums are
    rescaled by f^2) — directly comparable to HAADFData.calculateADF.
    ``aberrations``/``defocus`` shape the synthesized probe (exact — see
    probe_coefficients).
    """
    vals = _synth_chunks(sm, probe_positions, precision, probe_chunk,
                         "int" if intensity else "amp", weights=weights,
                         aberrations=aberrations, defocus=defocus)
    return np.asarray(vals) * float(sm.beams.f ** 2)


def smatrix_virtual_image(sm: SMatrix, probe_positions, weights,
                          intensity: bool = True,
                          precision: Optional[Precision] = None,
                          probe_chunk: int = 128, aberrations=None,
                          defocus: float = 0.0):
    """4D-STEM virtual image through the S-matrix: the detector-weighted
    reduction of every scan position's diffraction pattern, assembled on
    the reconstructed scan grid (the analysis.detectors.virtual_image
    semantics without ever materializing per-probe exit waves).

    Returns (image (n_x, n_y), scan_xs, scan_ys). ``weights`` lives on the
    FFTSHIFTED detector grid sm.kxs/kys (the window grid when f > 1);
    ``intensity=True`` gives the physical |psi|^2 detector (pass False for
    the reference HAADF amplitude convention, quirk #11)."""
    vals = smatrix_reduce(sm, probe_positions, weights, intensity=intensity,
                          precision=precision, probe_chunk=probe_chunk,
                          aberrations=aberrations, defocus=defocus)
    from ..analysis.detectors import _scan_grid
    xs, ys, nearest = _scan_grid(
        np.asarray(probe_positions, np.float64).reshape(-1, 2))
    return vals[nearest].reshape(len(xs), len(ys)), xs, ys

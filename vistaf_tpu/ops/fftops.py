"""FFT utilities: carrier-peak search, heuristic selection, sub-bin refinement.

Reference: ``shape_ftp.py:420-503`` and the stripe-segmentation copies at
``temperature_sensor.py:317-360``.  The Python candidate-filtering heuristics
(right half-plane, near-center-row, fall back when a filter empties the set)
are expressed as masked scoring over a static top-k set so everything stays
inside one jitted graph.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def fft2_shifted_mag(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(F_shifted, |F_shifted|) of a real image."""
    F = jnp.fft.fft2(x)
    Fs = jnp.fft.fftshift(F)
    return Fs, jnp.abs(Fs)


def dc_notch(mag: jnp.ndarray, dc_exclusion: int) -> jnp.ndarray:
    """Zero a (2*dc_exclusion)^2 square around the DC bin
    (``shape_ftp.py:425-431``)."""
    h, w = mag.shape
    cy, cx = h // 2, w // 2
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    in_notch = (yy >= cy - dc_exclusion) & (yy < cy + dc_exclusion) & \
               (xx >= cx - dc_exclusion) & (xx < cx + dc_exclusion)
    return jnp.where(in_notch, 0.0, mag)


@functools.partial(jax.jit, static_argnames=("n_peaks", "dc_exclusion"))
def find_top_peaks(mag: jnp.ndarray, dc_exclusion: int, n_peaks: int = 12):
    """Top-k peaks of the DC-notched magnitude, sorted descending.

    Returns (xs, ys, mags) each of shape (n_peaks,).
    """
    h, w = mag.shape
    m = dc_notch(mag.astype(jnp.float32), dc_exclusion)
    vals, idx = jax.lax.top_k(m.ravel(), n_peaks)
    ys = (idx // w).astype(jnp.int32)
    xs = (idx % w).astype(jnp.int32)
    return xs, ys, vals


def choose_carrier_peak(xs, ys, mags, h: int, w: int,
                        force_right_half_plane: bool = True,
                        prefer_near_center_row: bool = True,
                        peak_max_dy_frac: float = 0.12) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Heuristic carrier choice over the top-k set (``shape_ftp.py:444-463``):
    restrict to x > cx if any; then to |y - cy| <= frac*h if any; take the
    strongest of what remains."""
    cy, cx = h // 2, w // 2
    keep = jnp.ones_like(mags, dtype=bool)
    if force_right_half_plane:
        m1 = xs > cx
        keep = jnp.where(jnp.any(m1), m1, keep)
    if prefer_near_center_row:
        max_dy = jnp.int32(int(peak_max_dy_frac * h))
        m2 = keep & (jnp.abs(ys - cy) <= max_dy)
        keep = jnp.where(jnp.any(m2), m2, keep)
    score = jnp.where(keep, mags, -jnp.inf)
    i = jnp.argmax(score)
    return xs[i], ys[i]


def carrier_peak_cascade(mag: jnp.ndarray, dc_exclusion: int,
                         force_right_half_plane: bool = True,
                         prefer_near_center_row: bool = True,
                         peak_max_dy_frac: float = 0.12) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Carrier peak as three fused masked argmaxes instead of top-k + filter.

    ``lax.top_k`` over a native-4K magnitude plane costs ~14 ms on TPU (the
    XLA TopK lowering sorts); the reference's candidate-filter cascade
    (``shape_ftp.py:444-463``) only ever *uses* the strongest peak inside the
    preferred region, so evaluate the cascade directly: argmax over
    (notch & right-half & near-row), falling back to (notch & right-half),
    then to the notched plane — 0.2 ms, one fused pass.

    Semantics match ``find_top_peaks``+``choose_carrier_peak`` except when a
    filter region is empty *within the global top-k* but not within the full
    plane (then this picks the region's strongest bin while the reference
    falls back to an unfiltered top-k peak).  For stripe/fringe scenes the
    carrier is the dominant near-row right-half peak and the two agree; the
    latency presets take this path and the golden gates pin the outcome.
    """
    h, w = mag.shape
    cy, cx = h // 2, w // 2
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    notch = ~((iy >= cy - dc_exclusion) & (iy < cy + dc_exclusion) &
              (ix >= cx - dc_exclusion) & (ix < cx + dc_exclusion))
    m1 = (notch & (ix > cx)) if force_right_half_plane else notch
    m2 = (m1 & (jnp.abs(iy - cy) <= jnp.int32(int(peak_max_dy_frac * h)))) \
        if prefer_near_center_row else m1
    neg = jnp.float32(-3.0e38)
    mf = mag.astype(jnp.float32)
    i2 = jnp.argmax(jnp.where(m2, mf, neg))
    i1 = jnp.argmax(jnp.where(m1, mf, neg))
    i0 = jnp.argmax(jnp.where(notch, mf, neg))
    idx = jnp.where(jnp.any(m2), i2, jnp.where(jnp.any(m1), i1, i0))
    return (idx % w).astype(jnp.int32), (idx // w).astype(jnp.int32)


def _bandpass_window_tail(P: jnp.ndarray, sy, sx, px, py, h: int, w: int,
                          radius: float, rows: slice, cols: slice) -> jnp.ndarray:
    """Shared tail of the dynamic-bandpass IDFT: disk-mask the (psz, psz)
    spectrum window ``P`` (whose full-plane shifted-coordinates start is
    (sy, sx)) and evaluate the two twiddle matmuls + rank-1 carrier ramp."""
    import numpy as np
    psz = P.shape[0]
    ch, cw = h // 2, w // 2
    ii = jax.lax.broadcasted_iota(jnp.float32, (psz, psz), 0)
    jj = jax.lax.broadcasted_iota(jnp.float32, (psz, psz), 1)
    dy = ii + (sy - py).astype(jnp.float32)
    dx = jj + (sx - px).astype(jnp.float32)
    P = jnp.where(dy * dy + dx * dx <= float(radius) ** 2, P, 0.0)
    oy = np.arange(h, dtype=np.float64)[rows] if rows is not None else np.arange(h, dtype=np.float64)
    ox = np.arange(w, dtype=np.float64)[cols] if cols is not None else np.arange(w, dtype=np.float64)
    Ey = jnp.asarray(np.exp(2j * np.pi * np.outer(oy, np.arange(psz)) / h).astype(np.complex64))
    Ex = jnp.asarray(np.exp(2j * np.pi * np.outer(np.arange(psz), ox) / w).astype(np.complex64))
    inner = jnp.einsum("ya,ab,bx->yx", Ey, P, Ex,
                       precision=jax.lax.Precision.HIGHEST)
    fy = (sy - ch).astype(jnp.float32)
    fx = (sx - cw).astype(jnp.float32)
    cay = jnp.exp(2j * jnp.pi * (jnp.asarray(oy, jnp.float32) * fy / h))
    cax = jnp.exp(2j * jnp.pi * (jnp.asarray(ox, jnp.float32) * fx / w))
    return inner * (cay[:, None] / (h * w)) * cax[None, :]


def ifft2_bandpass_dynamic(F_shift: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray,
                           radius: float, rows: slice = None, cols: slice = None) -> jnp.ndarray:
    """ifft2(ifftshift(F_shift * disk(px, py, radius))) without the full-frame
    inverse FFT, for a *data-dependent* peak position.

    The disk keeps only a (2r+1)^2 window of the spectrum, so the dense
    inverse transform factors exactly into two skinny twiddle matmuls over
    static frequency offsets times a rank-1 carrier ramp carrying the dynamic
    peak position (cf. ``ifft2_sparse_patch``, whose offsets are static):

        z = (Ey @ (window * disk) @ Ex) * cay[:, None] * cax[None, :]

    ~0.7 ms at 3840x2160 vs ~7 ms for mask+ifftshift+ifft2; identical math,
    f32-rounding-level differences only (rel err ~5e-5 measured).  ``rows``/
    ``cols`` restrict the reconstruction to a static output window (exact
    when every consumer is masked to a region inside it).
    """
    import numpy as np
    h, w = F_shift.shape
    rr = int(np.ceil(radius))
    psz = 2 * rr + 1
    sy = jnp.clip(py - rr, 0, h - psz)
    sx = jnp.clip(px - rr, 0, w - psz)
    P = jax.lax.dynamic_slice(F_shift, (sy, sx), (psz, psz))
    return _bandpass_window_tail(P, sy, sx, px, py, h, w, radius, rows, cols)


def carrier_peak_cascade_half(mag_half: jnp.ndarray, dc_exclusion: int,
                              prefer_near_center_row: bool = True,
                              peak_max_dy_frac: float = 0.12
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``carrier_peak_cascade`` over the row-shifted rfft2 half-spectrum
    (``mag_half[r, k] == |F_shift[r, cx + k]|`` for kx = k in [0, cx]).

    ``force_right_half_plane`` is a PRECONDITION here, not a flag — the
    half-spectrum only stores kx >= 0, which for a real input is the full
    information content.  Identical bin choice to the full-plane cascade:
    the notch box, the kx >= 1 right-half constraint and the near-row
    preference all live at kx >= 0; the final unfiltered fallback (which
    scans both half-planes in the full version) can differ only when the
    right half-plane minus the notch is empty — impossible for any real
    frame wider than the notch.  Returns (k, row) half-spectrum indices;
    the full-plane peak is (cx + k, row).
    """
    hf, kw = mag_half.shape
    cy = hf // 2
    dc = int(dc_exclusion)
    iy = jax.lax.broadcasted_iota(jnp.int32, (hf, kw), 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, (hf, kw), 1)
    notch = (ik < dc) & (iy >= cy - dc) & (iy < cy + dc)
    m1 = (~notch) & (ik >= 1)
    m2 = (m1 & (jnp.abs(iy - cy) <= jnp.int32(int(peak_max_dy_frac * hf)))) \
        if prefer_near_center_row else m1
    neg = jnp.float32(-3.0e38)
    mf = mag_half.astype(jnp.float32)
    i2 = jnp.argmax(jnp.where(m2, mf, neg))
    i1 = jnp.argmax(jnp.where(m1, mf, neg))
    i0 = jnp.argmax(jnp.where(~notch, mf, neg))
    idx = jnp.where(jnp.any(m2), i2, jnp.where(jnp.any(m1), i1, i0))
    return (idx % kw).astype(jnp.int32), (idx // kw).astype(jnp.int32)


def ifft2_bandpass_dynamic_half(Rr: jnp.ndarray, k_i: jnp.ndarray,
                                py: jnp.ndarray, radius: float,
                                rows: slice = None, cols: slice = None) -> jnp.ndarray:
    """``ifft2_bandpass_dynamic`` fed by the row-shifted rfft2 half-spectrum
    ``Rr`` (``Rr[r, k] == F_shift[r, cx + k]``, see
    ``carrier_peak_cascade_half``) instead of the full shifted spectrum.

    The disk window around the carrier can reach ``ceil(radius)`` columns of
    negative kx when the carrier frequency is low; those are reconstructed
    from Hermitian symmetry (``F(-ky, -kx) = conj(F(ky, kx))``, same
    construction as the demod rfft path, ``ftp/demod.py::_demod_pair_rfft``)
    — every window bin equals its full-``fft2`` counterpart up to
    rfft-vs-fft rounding dust, and the matmul tail is shared code.
    """
    import numpy as np
    h, kw = Rr.shape
    w = 2 * (kw - 1)
    cx = w // 2
    rr = int(np.ceil(radius))
    psz = 2 * rr + 1
    # Hermitian extension: rr negative-kx columns (mirror[r, k] =
    # conj(Rr[(h - r) % h, k]) = F_shift[r, cx - k])
    cols_pos = Rr[:, 1:rr + 1]
    mirror = jnp.conj(jnp.roll(jnp.flip(cols_pos, axis=0), 1, axis=0))
    E = jnp.concatenate([mirror[:, ::-1], Rr], axis=1)   # col j <-> kx = j - rr
    px = k_i + cx
    sy = jnp.clip(py - rr, 0, h - psz)
    sx = jnp.clip(px - rr, 0, w - psz)                   # full-plane window start
    P = jax.lax.dynamic_slice(E, (sy, sx - cx + rr), (psz, psz))
    return _bandpass_window_tail(P, sy, sx, px, py, h, w, radius, rows, cols)


def refine_peak_parabolic_log(mag: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray):
    """Sub-bin parabolic refinement on log magnitude
    (``shape_ftp.py:466-483``).  Returns float (x, y)."""
    h, w = mag.shape
    lm = jnp.log(mag.astype(jnp.float32) + 1e-12)

    def sub(fm1, f0, fp1):
        den = fm1 - 2.0 * f0 + fp1
        d = 0.5 * (fm1 - fp1) / den
        return jnp.where(jnp.abs(den) < 1e-12, 0.0, d)

    x = jnp.clip(px, 1, w - 2)
    y = jnp.clip(py, 1, h - 2)
    dx = sub(lm[y, x - 1], lm[y, x], lm[y, x + 1])
    dy = sub(lm[y - 1, x], lm[y, x], lm[y + 1, x])
    interior = (px > 0) & (px < w - 1) & (py > 0) & (py < h - 1)
    fx = jnp.where(interior, px.astype(jnp.float32) + dx, px.astype(jnp.float32))
    fy = jnp.where(interior, py.astype(jnp.float32) + dy, py.astype(jnp.float32))
    return fx, fy


def frac_ramp(h: int, w: int, dkx, dky, sign: float = -1.0) -> jnp.ndarray:
    """exp(sign * i * 2pi * (dkx*x/w + dky*y/h)) phase ramp
    (``shape_ftp.py:957-960``, ``shape_ftp.py:1683-1686``)."""
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    phase = 2.0 * jnp.pi * (dkx * (xx / w) + dky * (yy / h))
    return jnp.exp(1j * sign * phase)


def ifft2_sparse_patch(patch: jnp.ndarray, hf: int, wf: int,
                       row0: int, col0: int) -> jnp.ndarray:
    """ifft2(ifftshift(Z)) where Z is zero except ``patch`` placed at
    [row0:row0+psz, col0:col0+psz] of the SHIFTED spectrum.

    By DFT linearity the dense inverse transform collapses to two small
    twiddle matmuls: field = Ey @ patch @ Ex with static (hf, psz) and
    (psz, wf) inverse-DFT column matrices (the demod patch is recentered at
    DC, so the bin offsets are compile-time constants).  Exact — not an
    approximation — and ~10x cheaper than materializing the padded spectrum
    and running a full ifft2.  ``patch`` may have leading batch dims.
    """
    import numpy as np
    psz = patch.shape[-1]
    ch, cw = hf // 2, wf // 2
    u = np.arange(psz) + row0 - ch
    v = np.arange(psz) + col0 - cw
    Ey = (np.exp(2j * np.pi * np.outer(np.arange(hf), u) / hf) / hf).astype(np.complex64)
    Ex = (np.exp(2j * np.pi * np.outer(v, np.arange(wf)) / wf) / wf).astype(np.complex64)
    return jnp.einsum("ya,...ab,bx->...yx", jnp.asarray(Ey), patch, jnp.asarray(Ex),
                      precision=jax.lax.Precision.HIGHEST)


def reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """cv2.copyMakeBorder(..., BORDER_REFLECT) = symmetric padding
    (``shape_ftp.py:857-861``)."""
    return jnp.pad(x, pad, mode="symmetric")

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

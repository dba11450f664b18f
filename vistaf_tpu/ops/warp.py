"""Affine warps as gather-based bilinear sampling with OpenCV border modes.

Used by the ECC aligner, global-shift correction and the oriented-blur
rotation (``shape_ftp.py:570-587``, ``shape_ftp.py:1489-1491``,
``temperature_sensor.py:705-742``).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _fold_symmetric(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """BORDER_REFLECT (symmetric) index folding: fedcba|abcdef|fedcba."""
    period = 2 * n
    m = jnp.mod(idx, period)
    m = jnp.where(m < 0, m + period, m)
    return jnp.where(m >= n, period - 1 - m, m)


def _fold_reflect101(idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 folding: gfedcb|abcdefg|fedcba."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * (n - 1)
    m = jnp.mod(idx, period)
    m = jnp.where(m < 0, m + period, m)
    return jnp.where(m >= n, period - m, m)


def sample_bilinear(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray,
                    border: str = "reflect") -> jnp.ndarray:
    """Bilinear sample img at float coords (sy, sx) with border handling.

    border: 'reflect' (BORDER_REFLECT / symmetric), 'reflect101',
    'constant0' (zeros outside).
    """
    h, w = img.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).astype(jnp.float32)
    fy = (sy - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if border == "reflect":
        fold_y = lambda i: _fold_symmetric(i, h)
        fold_x = lambda i: _fold_symmetric(i, w)
    elif border == "reflect101":
        fold_y = lambda i: _fold_reflect101(i, h)
        fold_x = lambda i: _fold_reflect101(i, w)
    else:
        fold_y = lambda i: jnp.clip(i, 0, h - 1)
        fold_x = lambda i: jnp.clip(i, 0, w - 1)

    ya = fold_y(y0i)
    yb = fold_y(y0i + 1)
    xa = fold_x(x0i)
    xb = fold_x(x0i + 1)

    Ia = img[ya, xa]
    Ib = img[ya, xb]
    Ic = img[yb, xa]
    Id = img[yb, xb]

    top = Ia * (1.0 - fx) + Ib * fx
    bot = Ic * (1.0 - fx) + Id * fx
    out = top * (1.0 - fy) + bot * fy

    if border == "constant0":
        inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
        out = jnp.where(inside, out, 0.0)
    return out


def sample_bilinear_stack(stack: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample a (H, W, C) channel stack at float coords with
    zeros outside — one shared gather for all C channels (TPU gathers cost
    per-index, so stacking channels amortizes them)."""
    h, w, _ = stack.shape
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0).astype(jnp.float32)[..., None]
    fy = (sy - y0).astype(jnp.float32)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    Ia = stack[y0i, x0i]
    Ib = stack[y0i, x1i]
    Ic = stack[y1i, x0i]
    Id = stack[y1i, x1i]
    top = Ia * (1.0 - fx) + Ib * fx
    bot = Ic * (1.0 - fx) + Id * fx
    out = top * (1.0 - fy) + bot * fy
    inside = ((sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1))[..., None]
    return jnp.where(inside, out, 0.0)


def translate_bilinear(img: jnp.ndarray, dx, dy, max_shift: int = 96,
                       border: str = "reflect") -> jnp.ndarray:
    """Pure-translation warp out(x, y) = img(x - dx, y - dy) with bilinear
    interpolation, as four dynamic_slices of a padded copy — no gathers.

    Matches cv2.warpAffine(M=[[1,0,dx],[0,1,dy]], INTER_LINEAR,
    BORDER_REFLECT) for |shift| <= max_shift.  TPU gathers pay per index;
    a global translation needs none.
    """
    h, w = img.shape
    pad = int(max_shift) + 2
    mode = "symmetric" if border == "reflect" else "edge"
    imp = jnp.pad(img.astype(jnp.float32), pad, mode=mode)

    sx = -jnp.asarray(dx, jnp.float32)
    sy = -jnp.asarray(dy, jnp.float32)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), -max_shift, max_shift)
    y0i = jnp.clip(y0.astype(jnp.int32), -max_shift, max_shift)

    def sl(iy, ix):
        return jax.lax.dynamic_slice(imp, (pad + iy, pad + ix), (h, w))

    a = sl(y0i, x0i)
    b = sl(y0i, x0i + 1)
    c = sl(y0i + 1, x0i)
    d = sl(y0i + 1, x0i + 1)
    top = a * (1.0 - fx) + b * fx
    bot = c * (1.0 - fx) + d * fx
    return top * (1.0 - fy) + bot * fy


def warp_affine_inverse_map(img: jnp.ndarray, M: jnp.ndarray,
                            border: str = "reflect") -> jnp.ndarray:
    """cv2.warpAffine(img, M, flags=INTER_LINEAR | WARP_INVERSE_MAP):
    dst(x, y) = src(M00*x + M01*y + M02, M10*x + M11*y + M12)."""
    h, w = img.shape
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = M[0, 0] * xx + M[0, 1] * yy + M[0, 2]
    sy = M[1, 0] * xx + M[1, 1] * yy + M[1, 2]
    return sample_bilinear(img.astype(jnp.float32), sy, sx, border=border)


def invert_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Invert a 2x3 affine matrix."""
    A = M[:, :2]
    t = M[:, 2]
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    inv = jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]]) / det
    tinv = -inv @ t
    return jnp.concatenate([inv, tinv[:, None]], axis=1)


def warp_affine_forward(img: jnp.ndarray, M: jnp.ndarray,
                        border: str = "reflect") -> jnp.ndarray:
    """cv2.warpAffine without WARP_INVERSE_MAP (M maps src -> dst; sampling
    uses M^-1)."""
    return warp_affine_inverse_map(img, invert_affine(M), border=border)


def translation_matrix(dx, dy) -> jnp.ndarray:
    return jnp.array([[1.0, 0.0, dx], [0.0, 1.0, dy]], jnp.float32)


def rotation_matrix(center: Tuple[float, float], angle_deg, scale: float = 1.0) -> jnp.ndarray:
    """cv2.getRotationMatrix2D equivalent."""
    a = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    alpha = scale * jnp.cos(a)
    beta = scale * jnp.sin(a)
    cx, cy = center
    return jnp.array([
        [alpha, beta, (1.0 - alpha) * cx - beta * cy],
        [-beta, alpha, beta * cx + (1.0 - alpha) * cy],
    ], jnp.float32)

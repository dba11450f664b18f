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


def _hat_resample_axis(S: jnp.ndarray, disp: jnp.ndarray, K: int, axis: int,
                       border: str = "constant0") -> jnp.ndarray:
    """1-D linear resample along spatial ``axis`` (1=rows, 2=cols) by a
    per-element displacement field.

    out[p] = S[p + disp[p]] via hat weights over statically shifted copies:
    out = sum_k max(0, 1-|disp-k|) * shift(S, k) for k in [-K, K] — pure
    elementwise ops + static slices, NO gathers (TPU gathers cost ~200 us
    per ECC iteration; this is the reason this function exists).
    Displacements with |disp| > K-1 fade to 0 ('constant0' border) or read
    the symmetric reflection ('reflect' = cv2 BORDER_REFLECT).
    ``S`` is channel-first (C, H, W) so the tiled minor dims stay spatial;
    ``disp`` is (H, W).
    """
    _, H, W = S.shape
    if axis == 1:
        pad = ((0, 0), (K, K), (0, 0))
    else:
        pad = ((0, 0), (0, 0), (K, K))
    mode = "symmetric" if border == "reflect" else "constant"
    P = jnp.pad(S, pad, mode=mode)
    d = disp[None, ...]
    out = jnp.zeros_like(S)
    for k in range(-K, K + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(d - k))
        if axis == 1:
            sl = P[:, K + k:K + k + H, :]
        else:
            sl = P[:, :, K + k:K + k + W]
        out = out + sl * w
    return out


def shear_warp_stack(S: jnp.ndarray, M: jnp.ndarray, K: int = 4,
                     border: str = "constant0") -> jnp.ndarray:
    """Affine inverse-map warp of a channel-first (C, H, W) stack by two 1-D
    shear passes (Catmull–Smith), gather-free.

    dst(y, x) = S(M10*x + M11*y + M12, M00*x + M01*y + M02), constant0
    border, valid while every intermediate displacement stays within
    ±(K-1) px — the ECC refinement regime (global translation is removed
    beforehand, so residual warps are ~1 px).

    Exact pass decomposition: with u = psi(y, x) = a00*x + a01*y + a02 the
    horizontal map, the vertical pass must produce A(v, u) = S(phi(v, u), u)
    with phi(v, u) = (a10/a00)*u + (a11 - a10*a01/a00)*v + (a12 -
    a10*a02/a00); then out(y, x) = A(y, psi(y, x)).  The only deviation
    from true 2-D bilinear sampling is the separable interpolation order,
    negligible on pre-blurred inputs.
    """
    _, H, W = S.shape
    a00, a01, a02 = M[0, 0], M[0, 1], M[0, 2]
    a10, a11, a12 = M[1, 0], M[1, 1], M[1, 2]
    vv = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    r = a10 / a00
    disp_y = r * uu + (a11 - r * a01 - 1.0) * vv + (a12 - r * a02)
    A = _hat_resample_axis(S, disp_y, K, axis=1, border=border)
    disp_x = (a00 - 1.0) * uu + a01 * vv + a02
    return _hat_resample_axis(A, disp_x, K, axis=2, border=border)


def warp_affine_inverse_shear(img: jnp.ndarray, M: jnp.ndarray, K: int = 4,
                              border: str = "reflect") -> jnp.ndarray:
    """Gather-free warp_affine_inverse_map for small warps (|disp| <= K-1):
    the single-channel shear-pass version of ``shear_warp_stack``."""
    out = shear_warp_stack(img.astype(jnp.float32)[None], M, K=K, border=border)
    return out[0]


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

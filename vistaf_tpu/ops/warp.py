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


def _shift_zero(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Shift ``x`` by static ``k`` along ``axis`` with zero fill (content
    moves toward higher indices for k > 0): out[i] = x[i - k]."""
    if k == 0:
        return x
    n = x.shape[axis]
    pads = [(0, 0)] * x.ndim
    pads[axis] = (k, 0) if k > 0 else (0, -k)
    xp = jnp.pad(x, pads)
    start = [0] * x.ndim
    if k < 0:
        start[axis] = -k
    return jax.lax.slice(xp, start, [s + st for s, st in zip(x.shape, start)])


def line_shift_frac(stack: jnp.ndarray, s: jnp.ndarray, shift_axis: int,
                    line_axis: int, bits: int) -> jnp.ndarray:
    """Per-line fractional shift, gather-free: each line indexed along
    ``line_axis`` is shifted along ``shift_axis`` by its own float amount
    (out[..., i, ...] = stack[..., i - s_line, ...] on the shift axis),
    zero border.  ``s`` has length ``stack.shape[line_axis]``.

    The integer part is applied by binary decomposition — ``bits``
    select-shift passes of statically shifted copies (pure VPU selects, no
    gathers; shifts beyond ±(2^bits - 1) are clamped) — and the fraction by
    a 2-tap linear blend.  This only composes because the shift is constant
    along ``shift_axis`` (the axes must differ): every pixel of a line
    moves coherently, so later passes shift already-shifted content by the
    line's own remaining bits.  This is what makes large-displacement
    shears (rotation at native 4K needs shifts of hundreds of px)
    affordable on TPU, where a bilinear gather over 8 M pixels costs ~100x
    more.
    """
    assert shift_axis != line_axis
    shape = [1] * stack.ndim
    shape[line_axis] = stack.shape[line_axis]

    def bc(v):
        return v.reshape(shape)

    lim = (1 << bits) - 1
    k = jnp.clip(jnp.floor(s), -lim, lim).astype(jnp.int32)
    f = jnp.clip(s - k, 0.0, 1.0).astype(jnp.float32)
    pos = k >= 0
    m = jnp.abs(k)
    # fractional 2-tap blend FIRST (on the unshifted array padded by one
    # zero line at the high end, so neither border's partial tap is lost to
    # intermediate zero fill), then the integer shift, then crop
    pads = [(0, 0)] * stack.ndim
    pads[shift_axis] = (0, 1)
    xp1 = jnp.pad(stack, pads)
    x = bc(1.0 - f) * xp1 + bc(f) * _shift_zero(xp1, 1, shift_axis)
    for b in range(bits):
        bit = ((m >> b) & 1) == 1
        xp = _shift_zero(x, 1 << b, shift_axis)
        xn = _shift_zero(x, -(1 << b), shift_axis)
        x = jnp.where(bc(bit & pos), xp, jnp.where(bc(bit & ~pos), xn, x))
    return jax.lax.slice_in_dim(x, 0, stack.shape[shift_axis], axis=shift_axis)


def _shear_bits(max_shift: float) -> int:
    import math
    return max(1, int(math.ceil(math.log2(max_shift + 2.0))))


_SHEAR_MAX_DEG = 50.0   # callers fold larger rotations by quarter turns


def rotate_stack_shear(stack: jnp.ndarray, angle_deg, center) -> jnp.ndarray:
    """Gather-free rotation of an (H, W, C) stack about ``center``:
    numerically interchangeable with sampling through
    ``rotation_matrix(center, angle_deg)`` with a constant0 border, but
    built from a Paeth three-shear decomposition of the inverse map — each
    shear a per-line fractional shift via ``line_shift_frac``.

    Replaces the two full-frame bilinear gathers of the oriented-blur
    rotation (``temperature_sensor.py:705-742``), which dominated the 4K
    temperature latency (~577 of ~690 ms; scripts/profile_temp4k.py).
    Valid for |angle_deg| <= 50; the oriented-blur caller folds larger
    angles into quarter turns plus a sigma swap.
    """
    h, w, _ = stack.shape
    cx, cy = float(center[0]), float(center[1])

    # inverse map = rotation by -angle about the same center:
    # [[cos A, -sin A], [sin A, cos A]], A = deg2rad(angle_deg).
    A = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    c_ = jnp.cos(A)
    S = -jnp.sin(A)    # top-right entry
    safe = jnp.where(jnp.abs(S) < 1e-8, 1.0, S)
    a = jnp.where(jnp.abs(S) < 1e-8, 0.0, (1.0 - c_) / safe)   # tan(phi/2)
    b = -S

    import math
    half_y = max(cy, (h - 1) - cy)
    half_x = max(cx, (w - 1) - cx)
    bits_x = _shear_bits(math.tan(math.radians(_SHEAR_MAX_DEG) / 2) * half_y)
    bits_y = _shear_bits(math.sin(math.radians(_SHEAR_MAX_DEG)) * half_x)

    rows = jnp.arange(h, dtype=jnp.float32) - cy
    cols = jnp.arange(w, dtype=jnp.float32) - cx
    # pass 1/3: Sx(a) about center — out(y, x) = in(y, x + a*(y - cy))
    sx = -a * rows
    # pass 2: Sy(b) — out(y, x) = in(y + b*(x - cx), x)
    sy = -b * cols

    out = line_shift_frac(stack, sx, shift_axis=1, line_axis=0, bits=bits_x)
    out = line_shift_frac(out, sy, shift_axis=0, line_axis=1, bits=bits_y)
    return line_shift_frac(out, sx, shift_axis=1, line_axis=0, bits=bits_x)


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

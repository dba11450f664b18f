"""Color conversions matching OpenCV 8-bit conventions, as jnp ops.

The OpenCV 8-bit LAB convention (L scaled to 0..255, a/b offset by +128) is
load-bearing: all temperature models were trained on it
(``temperature_sensor.py:284-292``).  These ops reproduce the float math of
OpenCV's conversions; 8-bit rounding is emulated where the reference pipeline
materialized uint8 intermediates.

Reference: BGR2GRAY / BGR2LAB usage at ``shape_ftp.py:1483-1484``,
``temperature_sensor.py:279-292``.
"""
from __future__ import annotations

import jax.numpy as jnp

# ITU-R BT.601 luma weights used by cv2.COLOR_BGR2GRAY.
_GRAY_W = (0.299, 0.587, 0.114)  # R, G, B

# sRGB -> XYZ (D65) matrix used by OpenCV's RGB2Lab.
_XYZ_M = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
# D65 white point.
_WHITE = (0.950456, 1.0, 1.088754)


def bgr_to_gray(bgr: jnp.ndarray, round_u8: bool = True) -> jnp.ndarray:
    """BGR (H, W, 3) uint8/float -> float32 gray.

    With ``round_u8`` the result is rounded to the nearest integer, matching
    the reference which materializes a uint8 gray before promoting to float
    (``shape_ftp.py:1511-1512``).
    """
    b = bgr[..., 0].astype(jnp.float32)
    g = bgr[..., 1].astype(jnp.float32)
    r = bgr[..., 2].astype(jnp.float32)
    y = _GRAY_W[0] * r + _GRAY_W[1] * g + _GRAY_W[2] * b
    if round_u8:
        y = jnp.round(y)
    return y


def _srgb_inverse_gamma(c: jnp.ndarray) -> jnp.ndarray:
    """sRGB companding removal (c in [0,1])."""
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _f_lab(t: jnp.ndarray) -> jnp.ndarray:
    """CIE L*a*b* forward nonlinearity."""
    thr = 0.008856
    return jnp.where(t > thr, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def bgr_to_lab_u8(bgr: jnp.ndarray, round_u8: bool = True) -> jnp.ndarray:
    """BGR (H, W, 3) uint8 -> float32 LAB in OpenCV 8-bit scaling.

    L in [0, 255] (100 * 255/100 scaling), a/b offset by +128.  Matches
    cv2.cvtColor(img, cv2.COLOR_BGR2LAB) on uint8 input to within 8-bit LUT
    quantization (~1 LSB).
    """
    b = bgr[..., 0].astype(jnp.float32) / 255.0
    g = bgr[..., 1].astype(jnp.float32) / 255.0
    r = bgr[..., 2].astype(jnp.float32) / 255.0

    rl = _srgb_inverse_gamma(r)
    gl = _srgb_inverse_gamma(g)
    bl = _srgb_inverse_gamma(b)

    x = (_XYZ_M[0][0] * rl + _XYZ_M[0][1] * gl + _XYZ_M[0][2] * bl) / _WHITE[0]
    y = (_XYZ_M[1][0] * rl + _XYZ_M[1][1] * gl + _XYZ_M[1][2] * bl) / _WHITE[1]
    z = (_XYZ_M[2][0] * rl + _XYZ_M[2][1] * gl + _XYZ_M[2][2] * bl) / _WHITE[2]

    fx = _f_lab(x)
    fy = _f_lab(y)
    fz = _f_lab(z)

    L = jnp.where(y > 0.008856, 116.0 * jnp.cbrt(y) - 16.0, 903.3 * y)
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)

    L8 = L * (255.0 / 100.0)
    a8 = a + 128.0
    b8 = bb + 128.0
    lab = jnp.stack([L8, a8, b8], axis=-1)
    if round_u8:
        lab = jnp.clip(jnp.round(lab), 0.0, 255.0)
    return lab


def chroma_ab(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """LAB chroma with OpenCV's +128 centering
    (``temperature_sensor.py:795``)."""
    return jnp.sqrt((a - 128.0) ** 2 + (b - 128.0) ** 2)

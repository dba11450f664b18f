"""Separable filtering ops with OpenCV-compatible kernels and borders.

All convolutions run as XLA ``conv_general_dilated`` calls (fusible, MXU/VPU
friendly); kernels are computed host-side with the exact OpenCV rules so the
TPU path is numerically interchangeable with the reference's cv2 calls.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def gaussian_kernel1d(sigma: float, ksize: int = 0, u8: bool = False) -> np.ndarray:
    """cv2.getGaussianKernel-compatible kernel.

    If ``ksize`` is 0 it is derived from sigma the way cv2.GaussianBlur does
    for (0, 0) kernels: ``round(sigma * (3 if u8 else 4) * 2 + 1) | 1``.
    """
    if ksize <= 0:
        ksize = int(round(sigma * (3 if u8 else 4) * 2 + 1)) | 1
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    k /= k.sum()
    return k.astype(np.float32)


def _reflect101_pad(x: jnp.ndarray, pad_h: int, pad_w: int) -> jnp.ndarray:
    """BORDER_REFLECT_101 padding (cv2 filtering default): gfedcb|abcd|cbafed."""
    return jnp.pad(x, ((pad_h, pad_h), (pad_w, pad_w)), mode="reflect")


def _sep_conv2d(x: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """Separable 2-D convolution with REFLECT_101 border, float32."""
    x = x.astype(jnp.float32)
    ph = (len(ky) - 1) // 2
    pw = (len(kx) - 1) // 2
    xp = _reflect101_pad(x, ph, pw)
    img = xp[jnp.newaxis, jnp.newaxis, :, :]
    k_row = jnp.asarray(kx, jnp.float32)[jnp.newaxis, jnp.newaxis, jnp.newaxis, :]
    out = jax.lax.conv_general_dilated(img, k_row, window_strides=(1, 1), padding="VALID")
    k_col = jnp.asarray(ky, jnp.float32)[jnp.newaxis, jnp.newaxis, :, jnp.newaxis]
    out = jax.lax.conv_general_dilated(out, k_col, window_strides=(1, 1), padding="VALID")
    return out[0, 0]


@functools.partial(jax.jit, static_argnames=("sigma_x", "sigma_y", "ksize", "u8"))
def gaussian_blur(x: jnp.ndarray, sigma_x: float, sigma_y: float = 0.0,
                  ksize: int = 0, u8: bool = False) -> jnp.ndarray:
    """cv2.GaussianBlur(x, (ksize, ksize), sigma_x, sigma_y) equivalent on
    float32, REFLECT_101 border.

    ``sigma_y == 0`` means "same as sigma_x" (cv2 semantics).
    """
    sy = sigma_y if sigma_y > 0 else sigma_x
    kx = gaussian_kernel1d(sigma_x, ksize, u8=u8)
    ky = gaussian_kernel1d(sy, ksize, u8=u8)
    return _sep_conv2d(x, ky, kx)


def gaussian_blur_u8_round(x: jnp.ndarray, ksize: int) -> jnp.ndarray:
    """8-bit blur with sigma derived from ksize and result rounded, matching
    cv2.GaussianBlur on uint8 images (``temperature_sensor.py:279-282``)."""
    out = gaussian_blur(x.astype(jnp.float32), 0.0, 0.0, ksize=ksize, u8=True)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def box_filter(x: jnp.ndarray, ksize: int, normalize: bool = False) -> jnp.ndarray:
    """cv2.boxFilter with REFLECT_101 border (``shape_ftp.py:1166-1167``)."""
    k = np.ones(ksize, np.float32)
    if normalize:
        k /= ksize
    out = _sep_conv2d(x, k, k)
    return out


def sobel(x: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """cv2.Sobel(x, CV_32F, dx, dy, ksize=3) equivalent
    (``shape_ftp.py:633-634``)."""
    deriv = np.array([-1.0, 0.0, 1.0], np.float32)
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    if dx == 1 and dy == 0:
        return _sep_conv2d(x, smooth, deriv)
    if dx == 0 and dy == 1:
        return _sep_conv2d(x, deriv, smooth)
    raise ValueError("sobel supports (1,0) or (0,1)")


def gradient_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    gx = sobel(x, 1, 0)
    gy = sobel(x, 0, 1)
    return jnp.sqrt(gx * gx + gy * gy)


def masked_gaussian_smooth(z: jnp.ndarray, mask: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Normalized-convolution smoothing: blur(z*m)/blur(m)
    (``shape_ftp.py:1139-1147``)."""
    if sigma <= 0:
        return z
    m = mask.astype(jnp.float32)
    z0 = jnp.where(mask, z, 0.0).astype(jnp.float32)
    num = gaussian_blur(z0, sigma)
    den = gaussian_blur(m, sigma) + 1e-6
    return (num / den).astype(jnp.float32)


def hanning_window(h: int, w: int) -> np.ndarray:
    """cv2.createHanningWindow equivalent (w, h) -> (h, w) float32.

    Note cv2 returns sqrt(hann_row * hann_col), not the plain product.
    """
    wy = np.hanning(h) if h > 1 else np.ones(1)
    wx = np.hanning(w) if w > 1 else np.ones(1)
    return np.sqrt(wy[:, None] * wx[None, :]).astype(np.float32)


def hann_patch(hp: int, wp: int) -> np.ndarray:
    """Hann window for the FFT sideband patch (``shape_ftp.py:800-807``)."""
    wy = np.hanning(hp).astype(np.float32)
    wx = np.hanning(wp).astype(np.float32)
    return wy[:, None] * wx[None, :]

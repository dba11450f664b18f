"""Separable filtering ops with OpenCV-compatible kernels and borders.

All convolutions run as XLA ``conv_general_dilated`` calls (fusible, MXU/VPU
friendly); kernels are computed host-side with the exact OpenCV rules so the
TPU path is numerically interchangeable with the reference's cv2 calls.
"""
from __future__ import annotations

import functools

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


def _fold_reflect101_idx(i: np.ndarray, n: int) -> np.ndarray:
    if n == 1:
        return np.zeros_like(i)
    period = 2 * (n - 1)
    m = np.mod(i, period)
    m = np.where(m < 0, m + period, m)
    return np.where(m >= n, period - m, m)


@functools.lru_cache(maxsize=128)
def _band_matrix(n: int, k_key) -> np.ndarray:
    """Dense banded filter matrix B with REFLECT_101 boundary folded in:
    (B @ v)[i] = sum_t k[t] * v[fold(i - half + t)].

    Single-channel small-image convs map terribly onto the TPU conv engine;
    as a dense matmul the same filter runs on the MXU in microseconds.
    """
    k = np.asarray(k_key, np.float64)
    half = (len(k) - 1) // 2
    B = np.zeros((n, n), np.float32)
    for t, w in enumerate(k):
        src = _fold_reflect101_idx(np.arange(n) - half + t, n)
        B[np.arange(n), src] += w
    return B


# Above this tap count a dense banded matmul (MXU) wins over the VPU
# shift-add decomposition even when the caller requests ``vpu=True``: a
# dense n x n matmul costs 2*n*H*W FLOPs per axis regardless of kernel
# size, so a 5-tap blur at native 4K burns ~100 GFLOP on the MXU (~10 ms
# measured) where shift-adds are a memory-bound ~10 FMA/px VPU pass
# (<1 ms).  63 covers the sigma<=6 kernels the pipelines use hot; the
# sigma-45 illumination kernel (361 taps) stays on the MXU either way.
#
# The two routes compute the same sum up to f32 ASSOCIATION ORDER, and
# that order is observable at the pipelines' knife-edge percentile
# thresholds: switching the force path to shift-adds moved the
# lightest-contact 4K golden (FINAL_TEMP_DEMO) from +0.40% to +1.42%
# force vs the committed reference output.  The banded order is
# therefore the DEFAULT (parity contract +-0.5%); ``vpu=True`` is a
# per-call opt-in plumbed from the deploy presets where the latency win
# is measured to matter (TempConfig.deploy: the per-channel feature
# blurs; see config.py).
_SHIFT_ADD_MAX_TAPS = 63


def _shift_add_sep2d(x: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """Small-kernel separable conv via padded static shifts (VPU),
    REFLECT_101 border — numerically the same sum as the banded matmul up
    to f32 association order."""
    x = x.astype(jnp.float32)
    h, w = x.shape
    ry, rx = (len(ky) - 1) // 2, (len(kx) - 1) // 2
    xp = _reflect101_pad(x, 0, rx)
    row = None
    for t, c in enumerate(kx):
        term = float(c) * jax.lax.slice(xp, (0, t), (h, t + w))
        row = term if row is None else row + term
    rp = _reflect101_pad(row, ry, 0)
    out = None
    for t, c in enumerate(ky):
        term = float(c) * jax.lax.slice(rp, (t, 0), (t + h, w))
        out = term if out is None else out + term
    return out


def _sep_conv2d(x: jnp.ndarray, ky: np.ndarray, kx: np.ndarray,
                vpu: bool = False) -> jnp.ndarray:
    """Separable 2-D convolution with REFLECT_101 border, float32.

    ``vpu=False`` (default): two banded matmuls on the MXU (single-channel
    lax.conv is pathological on TPU) — the parity-contract association
    order.  ``vpu=True``: small kernels run as fused shift-adds on the VPU
    instead — see _SHIFT_ADD_MAX_TAPS for the routing and the accuracy
    trade."""
    if (vpu and max(len(ky), len(kx)) <= _SHIFT_ADD_MAX_TAPS
            # reflect padding needs radius < dim; tiny crops take the matmul
            and (len(ky) - 1) // 2 < x.shape[0]
            and (len(kx) - 1) // 2 < x.shape[1]):
        return _shift_add_sep2d(x, ky, kx)
    x = x.astype(jnp.float32)
    h, w = x.shape
    By = jnp.asarray(_band_matrix(h, tuple(np.asarray(ky, np.float64))))
    Bx = jnp.asarray(_band_matrix(w, tuple(np.asarray(kx, np.float64))))
    out = jnp.dot(By, x, preferred_element_type=jnp.float32)
    out = jnp.dot(out, Bx.T, preferred_element_type=jnp.float32)
    return out


def _shift_add_conv3(x: jnp.ndarray, ky: np.ndarray, kx: np.ndarray) -> jnp.ndarray:
    """3-tap separable conv via padded shifts (VPU), REFLECT_101 border."""
    x = x.astype(jnp.float32)
    xp = _reflect101_pad(x, 1, 1)
    h, w = x.shape
    row = (kx[0] * xp[1:-1, 0:w] + kx[1] * xp[1:-1, 1:w + 1] + kx[2] * xp[1:-1, 2:w + 2])
    rp = jnp.pad(row, ((1, 1), (0, 0)), mode="reflect")
    out = ky[0] * rp[0:h, :] + ky[1] * rp[1:h + 1, :] + ky[2] * rp[2:h + 2, :]
    return out


@functools.partial(jax.jit,
                   static_argnames=("sigma_x", "sigma_y", "ksize", "u8", "vpu"))
def gaussian_blur(x: jnp.ndarray, sigma_x: float, sigma_y: float = 0.0,
                  ksize: int = 0, u8: bool = False,
                  vpu: bool = False) -> jnp.ndarray:
    """cv2.GaussianBlur(x, (ksize, ksize), sigma_x, sigma_y) equivalent on
    float32, REFLECT_101 border.

    ``sigma_y == 0`` means "same as sigma_x" (cv2 semantics).  ``vpu``
    selects the shift-add association order (see _sep_conv2d).
    """
    sy = sigma_y if sigma_y > 0 else sigma_x
    kx = gaussian_kernel1d(sigma_x, ksize, u8=u8)
    ky = gaussian_kernel1d(sy, ksize, u8=u8)
    return _sep_conv2d(x, ky, kx, vpu=vpu)


def gaussian_blur_u8_round(x: jnp.ndarray, ksize: int,
                           vpu: bool = False) -> jnp.ndarray:
    """8-bit blur with sigma derived from ksize and result rounded, matching
    cv2.GaussianBlur on uint8 images (``temperature_sensor.py:279-282``)."""
    out = gaussian_blur(x.astype(jnp.float32), 0.0, 0.0, ksize=ksize, u8=True,
                        vpu=vpu)
    return jnp.clip(jnp.round(out), 0.0, 255.0)


def box_filter(x: jnp.ndarray, ksize: int, normalize: bool = False,
               vpu: bool = False) -> jnp.ndarray:
    """cv2.boxFilter with REFLECT_101 border (``shape_ftp.py:1166-1167``)."""
    k = np.ones(ksize, np.float32)
    if normalize:
        k /= ksize
    out = _sep_conv2d(x, k, k, vpu=vpu)
    return out


def sobel(x: jnp.ndarray, dx: int, dy: int) -> jnp.ndarray:
    """cv2.Sobel(x, CV_32F, dx, dy, ksize=3) equivalent
    (``shape_ftp.py:633-634``).

    Note cv2's correlation kernel for dx=1 is [-1, 0, +1] left-to-right;
    as convolution-style shift-add below the taps index source offsets
    directly, so the +1 tap multiplies the right neighbor.
    """
    deriv = np.array([-1.0, 0.0, 1.0], np.float32)
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    if dx == 1 and dy == 0:
        return _shift_add_conv3(x, smooth, deriv)
    if dx == 0 and dy == 1:
        return _shift_add_conv3(x, deriv, smooth)
    raise ValueError("sobel supports (1,0) or (0,1)")


def gradient_magnitude(x: jnp.ndarray) -> jnp.ndarray:
    gx = sobel(x, 1, 0)
    gy = sobel(x, 0, 1)
    return jnp.sqrt(gx * gx + gy * gy)


def masked_gaussian_smooth(z: jnp.ndarray, mask: jnp.ndarray, sigma: float,
                           vpu: bool = False) -> jnp.ndarray:
    """Normalized-convolution smoothing: blur(z*m)/blur(m)
    (``shape_ftp.py:1139-1147``)."""
    if sigma <= 0:
        return z
    m = mask.astype(jnp.float32)
    z0 = jnp.where(mask, z, 0.0).astype(jnp.float32)
    num = gaussian_blur(z0, sigma, vpu=vpu)
    den = gaussian_blur(m, sigma, vpu=vpu) + 1e-6
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

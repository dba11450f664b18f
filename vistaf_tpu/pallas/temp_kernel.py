"""Fused per-pixel temperature kernel.

The reference evaluates the temperature models in five separate full-frame
passes (LAB planes, chroma, WIDE sklearn predict, COLOR sklearn predict,
fusion — ``temperature_sensor.py:792-859``).  This Pallas kernel does the
whole per-pixel chain in one VMEM pass over row tiles:

    blurred BGR u8 -> LAB(+gray, OpenCV 8-bit convention) -> chroma
    -> scaled monomials -> WIDE poly -> COLOR poly -> isotonic interp
    -> validity gating -> blend-band fusion -> clamp

Mask logic that needs neighborhoods (stripe segmentation, dilation,
inpainting) stays in XLA ops; the kernel consumes the final boolean masks.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vistaf_tpu.calib.temp_weights import TempModelWeights
from vistaf_tpu.config import TempConfig

_TILE_ROWS = 32


def _cbrt(t):
    """Cube root for t >= 0 (Mosaic TPU has no cbrt primitive; use
    exp(log(t)/3) with a floor — inputs here are XYZ ratios in [0, ~1.09])."""
    return jnp.exp(jnp.log(jnp.maximum(t, 1e-30)) * (1.0 / 3.0))


def _lab_gray(b, g, r):
    """OpenCV 8-bit LAB + gray from float BGR in [0, 255]."""
    bb = b * (1.0 / 255.0)
    gg = g * (1.0 / 255.0)
    rr = r * (1.0 / 255.0)

    def inv_gamma(c):
        return jnp.where(c <= 0.04045, c * (1.0 / 12.92),
                         ((c + 0.055) * (1.0 / 1.055)) ** 2.4)

    rl = inv_gamma(rr)
    gl = inv_gamma(gg)
    bl = inv_gamma(bb)
    x = (0.412453 * rl + 0.357580 * gl + 0.180423 * bl) / 0.950456
    y = (0.212671 * rl + 0.715160 * gl + 0.072169 * bl)
    z = (0.019334 * rl + 0.119193 * gl + 0.950227 * bl) / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, _cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx = f(x)
    fy = f(y)
    fz = f(z)
    L = jnp.where(y > 0.008856, 116.0 * _cbrt(y) - 16.0, 903.3 * y)
    A = 500.0 * (fx - fy) + 128.0
    B = 200.0 * (fy - fz) + 128.0
    L8 = jnp.clip(jnp.round(L * (255.0 / 100.0)), 0.0, 255.0)
    A8 = jnp.clip(jnp.round(A), 0.0, 255.0)
    B8 = jnp.clip(jnp.round(B), 0.0, 255.0)
    gray = jnp.round(0.299 * r + 0.587 * g + 0.114 * b)
    return L8, A8, B8, gray


def _poly_eval(feats, weights: TempModelWeights):
    """Unrolled scaled-monomial evaluation (static exponent table)."""
    scaled = [(feats[i] - float(weights.scaler_mean[i])) / float(weights.scaler_scale[i])
              for i in range(len(feats))]
    out = jnp.full_like(feats[0], float(weights.intercept))
    powers = np.asarray(weights.powers)
    coef = np.asarray(weights.coef)
    for p in range(powers.shape[0]):
        c = float(coef[p])
        if c == 0.0:
            continue
        term = None
        for f in range(powers.shape[1]):
            e = int(powers[p, f])
            for _ in range(e):
                term = scaled[f] if term is None else term * scaled[f]
        out = out if term is None else out + c * term
        if term is None:
            out = out + c
    return out


def _isotonic(pred, iso_x: np.ndarray, iso_y: np.ndarray):
    """Piecewise-linear monotone interpolation with clipping, unrolled over
    the (static, small) knot table."""
    x = np.asarray(iso_x, np.float64)
    y = np.asarray(iso_y, np.float64)
    out = jnp.full_like(pred, float(y[0]))
    for i in range(len(x) - 1):
        x0, x1 = float(x[i]), float(x[i + 1])
        y0, y1 = float(y[i]), float(y[i + 1])
        if x1 <= x0:
            continue
        t = (pred - x0) / (x1 - x0)
        seg = y0 + jnp.clip(t, 0.0, 1.0) * (y1 - y0)
        out = jnp.where(pred >= x0, seg, out)
    return out


def _make_kernel(cfg: TempConfig, color: TempModelWeights, wide: TempModelWeights):
    def kernel(b_ref, g_ref, r_ref, roieff_ref, csup_ref, wide_out, color_out, csup_out):
        # channels arrive as separate (tile, w) planes: a trailing dim of 3
        # would land in the lane dimension and cripple Mosaic's layout
        b = b_ref[...]
        g = g_ref[...]
        r = r_ref[...]
        L, A, B, gray = _lab_gray(b, g, r)

        # mask planes arrive as float32 (Mosaic's compare support on narrow
        # int vectors is incomplete)
        roi_eff = roieff_ref[...] > 0.5
        # csup_ref carries the morphology-side gate (dilated light stripes,
        # saturation exclusion); the chroma gate fuses here
        chroma = jnp.sqrt((A - 128.0) ** 2 + (B - 128.0) ** 2)
        csup = (csup_ref[...] > 0.5) & (chroma >= float(cfg.color_chroma_min))

        wide_pred = _poly_eval((L, A, B, gray), wide)
        if wide.iso_x is not None:
            wide_pred = _isotonic(wide_pred, wide.iso_x, wide.iso_y)
        color_pred = _poly_eval((L, A, B), color)
        if color.iso_x is not None:
            color_pred = _isotonic(color_pred, color.iso_x, color.iso_y)

        wide_out[...] = jnp.where(roi_eff, wide_pred, jnp.nan).astype(jnp.float32)
        color_out[...] = jnp.where(csup, color_pred, jnp.nan).astype(jnp.float32)
        csup_out[...] = csup.astype(jnp.float32)

    return kernel


def make_fused_temperature_fn(cfg: TempConfig, color: TempModelWeights,
                              wide: TempModelWeights, interpret: bool = False):
    """Build a jitted (blurred_bgr, roi_eff, color_support) ->
    (wide_map_raw, color_map_raw) function with the weights baked into the
    kernel.  Maps are NaN outside their domains."""
    kernel = _make_kernel(cfg, color, wide)

    @jax.jit
    def fn(blurred_bgr, roi_eff, color_support_pre):
        h, w = blurred_bgr.shape[:2]
        tile = min(_TILE_ROWS, h)
        grid = (pl.cdiv(h, tile),)
        plane = pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM)
        wide_map, color_map, csup = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[plane] * 5,
            out_specs=(
                pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((h, w), jnp.float32),
                jax.ShapeDtypeStruct((h, w), jnp.float32),
                jax.ShapeDtypeStruct((h, w), jnp.float32),
            ),
            interpret=interpret,
        )(blurred_bgr[..., 0].astype(jnp.float32),
          blurred_bgr[..., 1].astype(jnp.float32),
          blurred_bgr[..., 2].astype(jnp.float32),
          roi_eff.astype(jnp.float32), color_support_pre.astype(jnp.float32))
        return wide_map, color_map, csup > 0.5

    return fn


def fused_temperature_maps(blurred_bgr: jnp.ndarray, roi_eff: jnp.ndarray,
                           color_support_pre: jnp.ndarray,
                           cfg: TempConfig, color: TempModelWeights,
                           wide: TempModelWeights,
                           interpret: bool = False):
    """One-pass raw WIDE/COLOR prediction maps (NaN outside their domains)
    plus the final chroma-gated color-support mask, replacing the separate
    LAB + chroma + predict passes.

    ``color_support_pre`` is the morphology-side gate (dilated light stripes
    & roi_eff & ~sat); the chroma >= color_chroma_min condition fuses into
    the kernel."""
    fn = make_fused_temperature_fn(cfg, color, wide, interpret=interpret)
    return fn(blurred_bgr, roi_eff, color_support_pre)

"""Synthetic grating scenes + resolution-scaled configs.

Used by the multi-chip dry run, the benchmark's small-frame config, and
tests that must exercise the full pipeline without the 4K reference data.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from vistaf_tpu.config import FTPConfig, TempConfig


def scaled_ftp_config(height: int, width: int,
                      base: Optional[FTPConfig] = None) -> FTPConfig:
    """FTPConfig with every pixel-dimension parameter scaled from the native
    3840x2160 geometry to (height, width)."""
    base = base or FTPConfig()
    sx = width / base.image_width
    sy = height / base.image_height
    s = float(np.sqrt(sx * sy))

    def pt(p):
        return (int(round(p[0] * sx)), int(round(p[1] * sy)))

    def px(v, lo=1):
        return max(lo, int(round(v * s)))

    return base.replace(
        image_height=height,
        image_width=width,
        outer_circle_p1=pt(base.outer_circle_p1),
        outer_circle_p2=pt(base.outer_circle_p2),
        outer_circle_p3=pt(base.outer_circle_p3),
        fft_pad_px=px(base.fft_pad_px, 0),
        pre_blur_sigma_px=max(0.4, base.pre_blur_sigma_px * s),
        illum_sigma_px=max(2.0, base.illum_sigma_px * s),
        apod_taper_px=px(base.apod_taper_px),
        quality_smooth_sigma_px=max(1.0, base.quality_smooth_sigma_px * s),
        valid_close_kernel=px(base.valid_close_kernel, 3) | 1,
        reliable_edge_margin_px=px(base.reliable_edge_margin_px),
        dilate_kernel_size=px(base.dilate_kernel_size, 3) | 1,
        bad_dilate_ksize=px(base.bad_dilate_ksize, 3) | 1,
        reliable_smooth_sigma_px=max(0.8, base.reliable_smooth_sigma_px * s),
        unreliable_smooth_sigma_px=max(1.5, base.unreliable_smooth_sigma_px * s),
        frontier_zero_band_px=px(base.frontier_zero_band_px, 4),
        hole_neighborhood_px=px(base.hole_neighborhood_px, 3) | 1,
        hole_min_dist_from_reliable_edge_px=px(base.hole_min_dist_from_reliable_edge_px),
        inpaint_radius=px(base.inpaint_radius, 2),
        bad_inpaint_radius=px(base.bad_inpaint_radius, 2),
        global_shift_blur_sigma=max(1.0, base.global_shift_blur_sigma * s),
        ecc_gauss_filt=max(1.0, base.ecc_gauss_filt * s),
        dc_exclusion=max(3, int(round(base.dc_exclusion * s * 2))),  # keep DC notch meaningful at small FFTs
        patch_half_width_bins=base.patch_half_width_bins,
        unwrap_cg_iters=base.unwrap_cg_iters,
        inpaint_iters=max(16, int(base.inpaint_iters * s * 2)),
    )


def synthetic_pair(height: int, width: int, cfg: FTPConfig,
                   period_px: float = 12.0, dent_depth_rad: float = 0.8,
                   seed: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """(ref_bgr, def_bgr) uint8 frames: carrier grating + Gaussian dent phase
    shift in the deformed frame."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    carrier = 2.0 * np.pi * xx / period_px

    from vistaf_tpu.ops.geometry import circle_from_3_points
    cx, cy, r = circle_from_3_points(cfg.outer_circle_p1, cfg.outer_circle_p2,
                                     cfg.outer_circle_p3)
    dent = dent_depth_rad * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * (0.25 * r) ** 2)))

    illum = 160.0 + 30.0 * np.exp(-(((xx - width / 2) ** 2 + (yy - height / 2) ** 2)
                                    / (2 * (0.8 * max(height, width)) ** 2)))

    def frame(phase_extra):
        sig = illum * (1.0 + 0.35 * np.cos(carrier + phase_extra))
        sig = sig + rng.normal(scale=1.5, size=sig.shape)
        g = np.clip(sig, 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)

    return frame(0.0), frame(dent)


def scaled_temp_config(height: int, width: int,
                       base: Optional[TempConfig] = None) -> TempConfig:
    base = base or TempConfig()
    sx = width / base.image_width
    sy = height / base.image_height
    s = float(np.sqrt(sx * sy))

    def pt(p):
        return (int(round(p[0] * sx)), int(round(p[1] * sy)))

    def px(v, lo=1):
        return max(lo, int(round(v * s)))

    return base.replace(
        image_height=height,
        image_width=width,
        outer_circle_p1=pt(base.outer_circle_p1),
        outer_circle_p2=pt(base.outer_circle_p2),
        outer_circle_p3=pt(base.outer_circle_p3),
        inner_circle_p1=pt(base.inner_circle_p1),
        inner_circle_p2=pt(base.inner_circle_p2),
        inner_circle_p3=pt(base.inner_circle_p3),
        crop_pad_px=px(base.crop_pad_px, 2),
        seg_band_radius=max(3.0, base.seg_band_radius * s),
        seg_dc_exclusion=max(3, int(round(base.seg_dc_exclusion * s))),
        seg_illum_sigma=max(2.0, base.seg_illum_sigma * s),
        sat_dilate_ksize=px(base.sat_dilate_ksize, 3) | 1,
        post_close_ky=px(base.post_close_ky, 3) | 1,
        post_open_ky=px(base.post_open_ky, 3) | 1,
        color_support_dilate=px(base.color_support_dilate, 1),
        final_smooth_sigma_across=max(1.0, base.final_smooth_sigma_across * s),
        final_smooth_sigma_along=max(0.5, base.final_smooth_sigma_along * s),
    )


def synthetic_temp_weights():
    """Tiny synthetic (L,a,b)/(L,a,b,gray) temperature models for tests and
    dry runs when the reference artifacts are unavailable."""
    from vistaf_tpu.calib.temp_weights import TempModelWeights, poly_powers

    powers3 = poly_powers(3, 1)
    color = TempModelWeights(
        name="color_model", feature_names=("L", "a", "b"),
        scaler_mean=np.array([130.0, 160.0, 90.0]),
        scaler_scale=np.array([27.0, 15.0, 19.0]),
        powers=powers3, coef=np.array([13.0, 8.0, 4.0, 2.0]),
        intercept=13.0, poly_degree=1)
    powers4 = poly_powers(4, 1)
    wide = TempModelWeights(
        name="wide_model", feature_names=("L", "a", "b", "gray"),
        scaler_mean=np.array([122.0, 128.0, 117.0, 115.0]),
        scaler_scale=np.array([50.0, 3.5, 2.3, 48.0]),
        powers=powers4, coef=np.array([17.5, 45.0, 1.2, 0.5, -36.0]),
        intercept=17.5, poly_degree=1)
    return color, wide

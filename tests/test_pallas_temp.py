"""Fused Pallas temperature kernel vs the jnp reference path (interpret
mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from vistaf_tpu.config import TempConfig
from vistaf_tpu.pallas.temp_kernel import fused_temperature_maps
from vistaf_tpu.utils.synthetic import synthetic_temp_weights
from vistaf_tpu.ops.color import bgr_to_gray, bgr_to_lab_u8, chroma_ab


def _jnp_reference(bgr, roi_eff, csup_pre, cfg, color, wide):
    lab = bgr_to_lab_u8(jnp.asarray(bgr))
    gray = bgr_to_gray(jnp.asarray(bgr))
    chroma = np.asarray(chroma_ab(lab[..., 1], lab[..., 2]))
    csup = csup_pre & (chroma >= cfg.color_chroma_min)
    feats_w = jnp.stack([lab[..., 0], lab[..., 1], lab[..., 2], gray], axis=-1)
    ref_wide = np.where(roi_eff, np.asarray(wide.predict(feats_w)), np.nan)
    feats_c = jnp.stack([lab[..., 0], lab[..., 1], lab[..., 2]], axis=-1)
    ref_color = np.where(csup, np.asarray(color.predict(feats_c)), np.nan)
    return ref_wide, ref_color, csup


def _assert_close(ours, ref):
    ours = np.asarray(ours)
    both = np.isfinite(ours) & np.isfinite(ref)
    # LAB u8 rounding sits exactly on .5 boundaries for a handful of pixels;
    # those flip one LSB between the two float orderings.
    assert (np.isfinite(ours) != np.isfinite(ref)).mean() < 2e-3
    d = np.abs(ours[both] - ref[both])
    assert (d > 1e-2).mean() < 2e-3
    assert np.percentile(d, 99.5) < 0.5


def test_fused_kernel_matches_jnp_path(rng):
    h, w = 64, 128
    cfg = TempConfig(image_height=h, image_width=w)
    color, wide = synthetic_temp_weights()

    bgr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    roi_eff = rng.random((h, w)) > 0.2
    csup_pre = roi_eff & (rng.random((h, w)) > 0.5)

    wide_map, color_map, csup = fused_temperature_maps(
        jnp.asarray(bgr), jnp.asarray(roi_eff), jnp.asarray(csup_pre),
        cfg, color, wide, interpret=True)
    ref_wide, ref_color, ref_csup = _jnp_reference(bgr, roi_eff, csup_pre, cfg, color, wide)

    _assert_close(wide_map, ref_wide)
    _assert_close(color_map, ref_color)
    # chroma-gate agreement (boundary pixels may flip with rounding)
    assert (np.asarray(csup) != ref_csup).mean() < 2e-3


def test_fused_kernel_with_isotonic(rng):
    h, w = 32, 128
    cfg = TempConfig(image_height=h, image_width=w, color_chroma_min=0.0)
    color, wide = synthetic_temp_weights()
    import dataclasses
    iso_x = np.linspace(10.0, 40.0, 12)
    iso_y = np.sort(iso_x + rng.normal(scale=0.5, size=12))
    color = dataclasses.replace(color, iso_x=iso_x, iso_y=iso_y)

    bgr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    ones = np.ones((h, w), bool)

    wide_map, color_map, csup = fused_temperature_maps(
        jnp.asarray(bgr), jnp.asarray(ones), jnp.asarray(ones),
        cfg, color, wide, interpret=True)
    ref_wide, ref_color, _ = _jnp_reference(bgr, ones, ones, cfg, color, wide)
    _assert_close(color_map, ref_color)


def test_pipeline_fused_flag_matches_default(rng):
    """TemperaturePipeline(use_fused_kernel=True) must agree with the jnp
    path end-to-end on a synthetic frame."""
    from vistaf_tpu.temperature.inference import TemperaturePipeline
    from vistaf_tpu.utils.synthetic import scaled_temp_config, synthetic_pair, synthetic_temp_weights
    from vistaf_tpu.utils.synthetic import scaled_ftp_config

    H, W = 144, 192
    color, wide = synthetic_temp_weights()
    cfg = scaled_temp_config(H, W)
    ref, de = synthetic_pair(H, W, scaled_ftp_config(H, W))

    base = TemperaturePipeline(cfg, color, wide)(de)
    # interpret mode (CPU backend in tests)
    fcfg = cfg.replace(use_fused_kernel=True)
    pipe = TemperaturePipeline(fcfg, color, wide)
    from vistaf_tpu.pallas.temp_kernel import make_fused_temperature_fn
    pipe._fused_fn = make_fused_temperature_fn(fcfg, color, wide, interpret=True)
    fused = pipe(de)

    a = base["temperature_map_final"]
    b = fused["temperature_map_final"]
    both = np.isfinite(a) & np.isfinite(b)
    assert (np.isfinite(a) != np.isfinite(b)).mean() < 5e-3
    assert np.abs(a[both] - b[both]).mean() < 0.05

"""Fused Pallas temperature kernel vs the jnp reference path (interpret
mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from vistaf_tpu.config import TempConfig
from vistaf_tpu.pallas.temp_kernel import fused_temperature_maps
from vistaf_tpu.utils.synthetic import synthetic_temp_weights
from vistaf_tpu.ops.color import bgr_to_gray, bgr_to_lab_u8


def test_fused_kernel_matches_jnp_path(rng):
    h, w = 64, 128
    cfg = TempConfig(image_height=h, image_width=w)
    color, wide = synthetic_temp_weights()

    bgr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    roi_eff = rng.random((h, w)) > 0.2
    csup = roi_eff & (rng.random((h, w)) > 0.5)

    wide_map, color_map = fused_temperature_maps(
        jnp.asarray(bgr), jnp.asarray(roi_eff), jnp.asarray(csup),
        cfg, color, wide, interpret=True)

    lab = bgr_to_lab_u8(jnp.asarray(bgr))
    gray = bgr_to_gray(jnp.asarray(bgr))
    feats_w = jnp.stack([lab[..., 0], lab[..., 1], lab[..., 2], gray], axis=-1)
    ref_wide = np.where(roi_eff, np.asarray(wide.predict(feats_w)), np.nan)
    feats_c = jnp.stack([lab[..., 0], lab[..., 1], lab[..., 2]], axis=-1)
    ref_color = np.where(csup, np.asarray(color.predict(feats_c)), np.nan)

    # LAB u8 rounding sits exactly on .5 boundaries for a handful of pixels;
    # those flip one LSB between the two float orderings.  Allow <=0.1%.
    for ours, ref in ((wide_map, ref_wide), (color_map, ref_color)):
        ours = np.asarray(ours)
        both = np.isfinite(ours) & np.isfinite(ref)
        assert (np.isfinite(ours) == np.isfinite(ref)).all()
        d = np.abs(ours[both] - ref[both])
        assert (d > 1e-3).mean() < 1e-3
        assert d.max() < 1.0


def test_fused_kernel_with_isotonic(rng):
    h, w = 32, 128
    cfg = TempConfig(image_height=h, image_width=w)
    color, wide = synthetic_temp_weights()
    # attach a synthetic isotonic table to the color model
    import dataclasses
    iso_x = np.linspace(10.0, 40.0, 12)
    iso_y = np.sort(iso_x + rng.normal(scale=0.5, size=12))
    color = dataclasses.replace(color, iso_x=iso_x, iso_y=iso_y)

    bgr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    roi_eff = np.ones((h, w), bool)
    csup = np.ones((h, w), bool)

    wide_map, color_map = fused_temperature_maps(
        jnp.asarray(bgr), jnp.asarray(roi_eff), jnp.asarray(csup),
        cfg, color, wide, interpret=True)

    lab = bgr_to_lab_u8(jnp.asarray(bgr))
    feats_c = jnp.stack([lab[..., 0], lab[..., 1], lab[..., 2]], axis=-1)
    ref_color = np.asarray(color.predict(feats_c))
    np.testing.assert_allclose(np.asarray(color_map), ref_color, rtol=1e-4, atol=1e-3)

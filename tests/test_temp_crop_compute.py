"""TempConfig.crop_compute (the deploy default): per-pixel stages run on
the static outer-ROI bbox and re-embed.  The pad covers every local-op
reach (inpaint diffusion moves 1 px/iteration), so results inside the ROI
must match the full-frame path; outside the bbox the maps are the same
NaN/zero fill the clamps produce anyway."""
import numpy as np
import jax.numpy as jnp
import pytest

from vistaf_tpu.config import TempConfig
from vistaf_tpu.temperature.inference import TemperaturePipeline
from vistaf_tpu.utils.synthetic import (scaled_ftp_config, scaled_temp_config,
                                        synthetic_pair, synthetic_temp_weights)


def _small_cfg():
    # small frame with a compact ROI circle so the bbox is a real crop:
    # circle center (320, 160) radius 80 -> bbox well inside 320x640
    return scaled_temp_config(320, 640).replace(
        outer_circle_p1=(400, 160), outer_circle_p2=(240, 160),
        outer_circle_p3=(320, 240), use_inner_circle=False,
        wide_inpaint_iters=8, color_inpaint_iters=4)


@pytest.mark.parametrize("rot", ["gather", "shear"])
def test_crop_compute_matches_full_frame(rng, rot):
    color, wide = synthetic_temp_weights()
    cfg0 = _small_cfg().replace(rotate_method=rot)
    _, de = synthetic_pair(320, 640, scaled_ftp_config(320, 640))

    full = TemperaturePipeline(cfg0, color, wide)(de)
    crop_pipe = TemperaturePipeline(cfg0.replace(crop_compute=True), color, wide)
    assert crop_pipe._compute_bbox is not None
    y0, y1, x0, x1 = crop_pipe._compute_bbox
    assert (y1 - y0) < 320 or (x1 - x0) < 640, "bbox must actually crop"
    cropped = crop_pipe(de)

    for key in ("temperature_map_final", "temperature_map_fused",
                "wide_map", "color_map"):
        a, b = full[key], cropped[key]
        assert a.shape == b.shape, key
        fa, fb = np.isfinite(a), np.isfinite(b)
        assert (fa != fb).mean() < 2e-3, key
        both = fa & fb
        np.testing.assert_allclose(a[both], b[both], atol=2e-3, err_msg=key)

    for key in ("t_mean", "t_max", "t_min", "t_std"):
        assert abs(float(full[key]) - float(cropped[key])) < 1e-2, key
    assert int(full["valid_pixels"]) == pytest.approx(
        int(cropped["valid_pixels"]), abs=50)
    # masks re-embed on the same canvas
    assert cropped["mask_color_support"].shape == (320, 640)
    assert cropped["source_map"].shape == (320, 640)


def test_crop_compute_with_fused_kernel(rng):
    """Deploy combines crop_compute with the fused Pallas per-pixel kernel;
    the kernel is shape-agnostic, so the cropped call must match the
    full-frame fused call (interpret mode on CPU)."""
    from vistaf_tpu.pallas.temp_kernel import make_fused_temperature_fn

    color, wide = synthetic_temp_weights()
    cfg = _small_cfg().replace(use_fused_kernel=True)
    _, de = synthetic_pair(320, 640, scaled_ftp_config(320, 640))

    full_pipe = TemperaturePipeline(cfg, color, wide)
    full_pipe._fused_fn = make_fused_temperature_fn(cfg, color, wide, interpret=True)
    full = full_pipe(de)

    crop_pipe = TemperaturePipeline(cfg.replace(crop_compute=True), color, wide)
    crop_pipe._fused_fn = make_fused_temperature_fn(cfg, color, wide, interpret=True)
    cropped = crop_pipe(de)

    a, b = full["temperature_map_final"], cropped["temperature_map_final"]
    fa, fb = np.isfinite(a), np.isfinite(b)
    assert (fa != fb).mean() < 2e-3
    both = fa & fb
    np.testing.assert_allclose(a[both], b[both], atol=2e-3)
    assert abs(float(full["t_mean"]) - float(cropped["t_mean"])) < 1e-2


def test_deploy_preset_runs_off_tpu(rng):
    """TempConfig.deploy() must run on any backend: the fused Pallas
    kernel only lowers on TPU, so off-TPU the pipeline takes the jnp path
    (regression: the deploy preset used to crash on CPU with 'Only
    interpret mode is supported')."""
    color, wide = synthetic_temp_weights()
    cfg = scaled_temp_config(160, 320).replace(
        use_fused_kernel=True, rotate_method="shear", crop_compute=True,
        wide_inpaint_iters=8, color_inpaint_iters=4)
    _, de = synthetic_pair(160, 320, scaled_ftp_config(160, 320))
    out = TemperaturePipeline(cfg, color, wide)(de)
    assert np.isfinite(float(out["t_mean"]))


def test_stats_surface_matches_full_call(rng):
    """TemperaturePipeline.stats fetches only the statistics tail; the
    values must equal __call__'s exactly (the stats never read the map
    embeds the scalar graph dead-codes away)."""
    color, wide = synthetic_temp_weights()
    cfg = _small_cfg()
    _, de = synthetic_pair(320, 640, scaled_ftp_config(320, 640))
    pipe = TemperaturePipeline(cfg, color, wide)
    full = pipe(de)
    st = pipe.stats(de)
    for k in ("t_mean", "t_min", "t_max", "t_std", "valid_pixels",
              "stripe_angle_rad", "stripe_period_px"):
        np.testing.assert_allclose(np.asarray(st[k]), np.asarray(full[k]),
                                   rtol=1e-6, atol=1e-6, err_msg=k)

"""Fused multimodal step: one jitted graph over both modality forwards
must reproduce the sequential two-graph path (multimodal_sensor.py:349-697
runs the two sensors in one process; the TPU-native fused step goes one
further and traces them into ONE XLA program so the deformed frame is
uploaded once and streaming callers can fetch scalars only)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe_and_frames():
    from vistaf_tpu.config import ForceConfig
    from vistaf_tpu.pipelines.force import ForcePipeline
    from vistaf_tpu.pipelines.multimodal import MultimodalPipeline
    from vistaf_tpu.temperature.inference import TemperaturePipeline
    from vistaf_tpu.utils.synthetic import (scaled_ftp_config, scaled_temp_config,
                                            synthetic_pair, synthetic_temp_weights)

    H, W = 144, 192
    fcfg = scaled_ftp_config(H, W).replace(percentile_method="hist",
                                           unwrap_cg_iters=8, ecc_iters=20,
                                           inpaint_iters=8)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0},
           "equation": "", "rmse": 0.002, "r2": 0.999}
    h2f = {"type": "growth", "params": {"a": 1.62, "b": 9.76},
           "equation": "", "rmse": 6.9, "r2": 0.77}
    force = ForcePipeline(fcfg, ForceConfig(), p2h, h2f)
    color, wide = synthetic_temp_weights()
    temp = TemperaturePipeline(scaled_temp_config(H, W), color, wide)
    pipe = MultimodalPipeline(force, temp)
    ref, de = synthetic_pair(H, W, fcfg)
    return pipe, ref, de


def test_fused_matches_sequential_maps(pipe_and_frames):
    pipe, ref, de = pipe_and_frames
    seq = pipe(ref, de)
    fus = pipe.step_fused(ref, de, fetch="maps")

    # force maps + scalars: identical math, one trace vs two — XLA may
    # fuse differently, so allow float-dust-level drift only
    f_s, f_f = seq["force"], fus["force"]
    np.testing.assert_allclose(f_f["height_map_mm_crop"],
                               f_s["height_map_mm_crop"],
                               rtol=1e-5, atol=1e-6, equal_nan=True)
    assert f_f["estimated_grating_period_px"] == pytest.approx(
        f_s["estimated_grating_period_px"], rel=1e-6)
    for k in ("volume_cm3", "contact_area_mm2", "max_depth_mm", "force_N",
              "mm_per_px"):
        assert f_f[k] == pytest.approx(f_s[k], rel=1e-4, abs=1e-7), k

    t_s, t_f = seq["temperature"], fus["temperature"]
    np.testing.assert_allclose(t_f["temperature_map_final"],
                               t_s["temperature_map_final"],
                               rtol=1e-5, atol=1e-4, equal_nan=True)
    assert np.array_equal(t_f["mask_roi_eff"], t_s["mask_roi_eff"])

    st_s, st_f = seq["temperature_stats"], fus["temperature_stats"]
    assert st_f["valid_pixels"] == st_s["valid_pixels"]
    for k in ("mean_C", "median_C", "std_C", "min_C", "max_C"):
        if np.isnan(st_s[k]):
            assert np.isnan(st_f[k])
        else:
            assert st_f[k] == pytest.approx(st_s[k], abs=1e-3), k


def test_fused_scalar_fetch(pipe_and_frames):
    """fetch='scalars' moves no maps: the returned dict is pure Python
    scalars and agrees with the maps-mode reductions."""
    pipe, ref, de = pipe_and_frames
    fus = pipe.step_fused(ref, de, fetch="maps")
    sc = pipe.step_fused(ref, de, fetch="scalars")
    assert all(isinstance(v, (int, float)) for v in sc.values())
    for k in ("volume_cm3", "contact_area_mm2", "max_depth_mm", "force_N"):
        assert sc[k] == pytest.approx(fus["force"][k], rel=1e-6, abs=1e-9), k
    # in-graph temperature stats use the same ROI convention as the host
    # stats (outer-roi & finite), so the means must agree
    if fus["temperature_stats"]["valid_pixels"]:
        assert sc["valid_pixels"] == fus["temperature_stats"]["valid_pixels"]
        assert sc["t_mean_C"] == pytest.approx(
            fus["temperature_stats"]["mean_C"], abs=1e-3)
    assert np.isfinite(sc["estimated_grating_period_px"])

"""Session-runner artifact contract: run a full multimodal session on small
synthetic frames and check the reference file tree + summary schema."""
import json
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available


def test_session_artifact_contract(tmp_path, monkeypatch):
    import cv2
    from vistaf_tpu.config import ForceConfig, SessionConfig
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.pipelines.force import ForcePipeline
    from vistaf_tpu.pipelines.multimodal import MultimodalPipeline
    from vistaf_tpu.runner.session import run_session
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
    ref_p = str(tmp_path / "ref.png")
    def_p = str(tmp_path / "def.png")
    cv2.imwrite(ref_p, ref)
    cv2.imwrite(def_p, de)

    out_root = str(tmp_path / "sessions")
    shown = []
    from vistaf_tpu.runner import figures
    monkeypatch.setattr(figures, "show_heightmap_3d_interactive",
                        lambda *a, **k: shown.append(a))
    summary = run_session(pipe, ref_p, def_p, str(tmp_path),
                          SessionConfig(output_root=out_root,
                                        show_3d_interactive=True),
                          timestamp="TEST")
    assert len(shown) == 1  # C16: the flag must reach the 3-D viewer

    sdir = os.path.join(out_root, "session_TEST")
    # file tree contract (multimodal_sensor.py:81-85, 649-665)
    for rel in [
        "force_sensing/result.json",
        "force_sensing/result.csv",
        "force_sensing/ftp_run/height_map_crop.npy",
        "force_sensing/ftp_run/height_map_bundle.npz",
        "force_sensing/ftp_run/07_phase_and_height_FINAL_SMOOTH_ROI.png",
        "temperature_sensing/temperature_map_final.npy",
        "temperature_sensing/temperature_map_fused.npy",
        "temperature_sensing/mask_roi.png",
        "temperature_sensing/mask_dark.png",
        "temperature_sensing/temperature_map_final_colormap.png",
        "temperature_sensing/temperature_legend_horizontal.png",
        "combined_outputs/multimodal_summary.json",
        "combined_outputs/force_result.json",
        "combined_outputs/temp_temperature_map_final_colormap.png",
        "combined_outputs/force_shape_heightmap.png",
    ]:
        assert os.path.exists(os.path.join(sdir, rel)), rel

    # summary schema (multimodal_sensor.py:592-646)
    with open(os.path.join(sdir, "combined_outputs/multimodal_summary.json")) as f:
        s = json.load(f)
    assert s["session_id"] == "TEST"
    fr = s["sensor_readings"]["force"]
    for k in ("force_N", "volume_cm3", "contact_area_mm2", "max_depth_mm", "scale_mm_per_px"):
        assert np.isfinite(fr[k])
    tr = s["sensor_readings"]["temperature"]
    for k in ("mean_C", "median_C", "std_C", "min_C", "max_C", "valid_pixels"):
        assert k in tr
    assert "calibration_performance" in s

    # force result.json matches the reference's field set (force_sensor.py:242-262)
    with open(os.path.join(sdir, "force_sensing/result.json")) as f:
        r = json.load(f)
    for k in ("reference_path", "deformed_path", "grating_pitch_mm", "depth_eps_mm",
              "estimated_grating_period_px", "mm_per_px", "volume_cm3",
              "contact_area_mm2", "max_depth_mm", "force_N", "force_model"):
        assert k in r


def test_show_heightmap_3d_interactive_headless():
    """SessionConfig.show_3d_interactive consumer: on a headless (Agg)
    backend the interactive window degrades to a no-op render and returns
    immediately (multimodal_sensor.py:670-679)."""
    import matplotlib
    matplotlib.use("Agg", force=True)
    from vistaf_tpu.runner import figures

    hm = np.zeros((40, 50), np.float32)
    hm[10:20, 10:20] = -0.5
    mask = np.isfinite(hm)
    figures.show_heightmap_3d_interactive(hm, mask, "test")  # must not block




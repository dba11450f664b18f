"""Full multimodal session on the real demo pair vs the committed
Demos_report summary (slow)."""
import json
import os

import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference data not mounted"),
]


def test_session_matches_reference_summary(tmp_path):
    from vistaf_tpu.config import SessionConfig
    from vistaf_tpu.pipelines.multimodal import MultimodalPipeline
    from vistaf_tpu.runner.session import run_session

    pipe = MultimodalPipeline.from_artifacts(REFERENCE_ROOT)
    s = run_session(
        pipe,
        os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_reference.jpg"),
        os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_E_deformed.jpg"),
        REFERENCE_ROOT, SessionConfig(output_root=str(tmp_path)), timestamp="T")

    with open(os.path.join(
            REFERENCE_ROOT,
            "Multimodal_Sensor/Demos_report/FINAL_E_deformed/combined_outputs/multimodal_summary.json")) as f:
        gold = json.load(f)["sensor_readings"]

    f_ours = s["sensor_readings"]["force"]
    f_gold = gold["force"]
    assert abs(f_ours["force_N"] - f_gold["force_N"]) / f_gold["force_N"] < 0.03
    assert abs(f_ours["max_depth_mm"] - f_gold["max_depth_mm"]) < 0.02
    assert abs(f_ours["scale_mm_per_px"] - f_gold["scale_mm_per_px"]) < 1e-6

    t_ours = s["sensor_readings"]["temperature"]
    t_gold = gold["temperature"]
    assert abs(t_ours["mean_C"] - t_gold["mean_C"]) < 0.1
    assert abs(t_ours["median_C"] - t_gold["median_C"]) < 0.1
    assert abs(t_ours["max_C"] - t_gold["max_C"]) < 0.5
    assert t_ours["valid_pixels"] == t_gold["valid_pixels"]

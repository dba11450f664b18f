"""End-to-end temperature golden against the reference demo outputs."""
import json
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference data not mounted"),
]


def test_temperature_golden_temp_demo():
    from vistaf_tpu.temperature.inference import TemperaturePipeline
    from vistaf_tpu.runner.io import imread_bgr

    pipe = TemperaturePipeline.from_artifacts(REFERENCE_ROOT)
    img = imread_bgr(os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_TEMP_DEMO.jpg"))
    out = pipe(img)

    with open(os.path.join(
            REFERENCE_ROOT,
            "Multimodal_Sensor/Demos_report/FINAL_TEMP_DEMO/combined_outputs/multimodal_summary.json")) as f:
        gold = json.load(f)["sensor_readings"]["temperature"]

    assert abs(float(out["t_mean"]) - gold["mean_C"]) < 0.2
    assert abs(float(out["t_max"]) - gold["max_C"]) < 1.0
    assert abs(float(out["t_min"]) - gold["min_C"]) < 0.2
    assert abs(float(out["t_std"]) - gold["std_C"]) < 0.3
    assert int(out["valid_pixels"]) == gold["valid_pixels"]

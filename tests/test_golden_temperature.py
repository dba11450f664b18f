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


# TPU-measured parity (round 2): TEMP_DEMO within tolerances below;
# ROUND_METAL (hot scene, black model dominant, 47.8 C max) mean
# 23.181/23.191, max 48.28/47.82; FINAL_E mean 20.826/20.833 -- all with
# exact valid-pixel counts.
@pytest.mark.parametrize("scene", ["FINAL_TEMP_DEMO", "FINAL_ROUND_METAL",
                                   "FINAL_E_deformed"])
def test_temperature_golden(scene):
    from vistaf_tpu.temperature.inference import TemperaturePipeline
    from vistaf_tpu.runner.io import imread_bgr

    pipe = TemperaturePipeline.from_artifacts(REFERENCE_ROOT)
    img = imread_bgr(os.path.join(REFERENCE_ROOT, f"Final_demos_images/{scene}.jpg"))
    out = pipe(img)

    with open(os.path.join(
            REFERENCE_ROOT,
            f"Multimodal_Sensor/Demos_report/{scene}/combined_outputs/multimodal_summary.json")) as f:
        gold = json.load(f)["sensor_readings"]["temperature"]

    assert abs(float(out["t_mean"]) - gold["mean_C"]) < 0.2
    assert abs(float(out["t_max"]) - gold["max_C"]) < 1.0
    assert abs(float(out["t_min"]) - gold["min_C"]) < 0.2
    assert abs(float(out["t_std"]) - gold["std_C"]) < 0.3
    assert int(out["valid_pixels"]) == gold["valid_pixels"]

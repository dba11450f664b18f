"""Slow trainer goldens: full re-fits on the reference datasets must
reproduce the published calibration metrics (BASELINE.md)."""
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference data not mounted"),
]


def test_color_trainer_reproduces_reference_metrics(tmp_path):
    """Colored-TLC trainer: degree selection and RMSE within tolerance of
    the reference's sklearn run (global deg2, means RMSE 0.4370).

    The GLOBAL model (the deployed artifact) must match the reference's
    degree exactly.  The heating/cooling variants' GroupKFold selection is
    knife-edge — measured in this environment the heating deg-1 vs deg-2
    CV RMSEs are 0.673645 vs 0.673955 (0.05% apart), so float drift across
    environment rebuilds flips the pick (a round-1 run selected deg2, the
    rebuilt round-3 image selects deg1).  For those variants the parity
    weight is carried by the RMSE bounds; the degree only has to stay
    inside the candidate range actually explored by the reference.

    RMSE tolerance history: round 1 documented a 0.461-vs-0.437 global
    gap and this test carried a 0.08 band.  The gap was stale — it
    predated the cv2-bit-exact LAB feature extraction (62e94ef); the
    round-4 re-run at HEAD reproduces every published RMSE exactly
    (heating 0.0/0.0, cooling 0.8500/0.8552, global 0.4370/0.7069), so
    the band is now the measured floor (solver/isotonic float dust)."""
    import json
    from vistaf_tpu.trainers import temperature_color as t
    out = t.train(
        os.path.join(REFERENCE_ROOT, "Temperature/Heating_Colored_Temp/heating-*.jpg"),
        os.path.join(REFERENCE_ROOT, "Temperature/Cooling_Colored_Temp/cooling_colored-*.jpg"),
        str(tmp_path))
    with open(os.path.join(REFERENCE_ROOT,
                           "Temperature/Colored_Model/calibration_out/models_final_summary_metrics.json")) as f:
        gold = json.load(f)["models_final"]
    for name in ("heating", "cooling", "global"):
        o = out["models_final"][name]
        g = gold[name]
        if name == "global":
            assert o["degree"] == g["degree"], name
        else:
            assert abs(o["degree"] - g["degree"]) <= 1, name
        assert abs(o["metrics_means"]["rmse_C"] - g["metrics_means"]["rmse_C"]) < 0.01, name
        assert abs(o["metrics_frames"]["rmse_C"] - g["metrics_frames"]["rmse_C"]) < 0.01, name
    # artifact contract
    assert os.path.exists(tmp_path / "models_final_summary_metrics.json")
    assert os.path.exists(tmp_path / "equations_color_models_final.txt")
    import glob
    assert glob.glob(str(tmp_path / "color_model_global_huber_deg*.joblib"))
    assert glob.glob(str(tmp_path / "color_model_global_huber_deg*.npz"))


def test_black_trainer_reproduces_reference_metrics(tmp_path):
    """Black-TLC trainer: per-model degrees and RMSEs match the reference
    (validated run: heating deg1 3.065/3.064, cooling deg2 2.776/2.780,
    global deg3 means 1.870 vs published 1.927)."""
    import json
    from vistaf_tpu.trainers import temperature_black as t
    out = t.train(
        os.path.join(REFERENCE_ROOT, "Temperature/Heating_MixedColorBlack_Temp/heating_mixed-*.jpg"),
        os.path.join(REFERENCE_ROOT, "Temperature/Cooling_MixedColorBlack_Temp/cooling_mixed-*.jpg"),
        str(tmp_path))
    with open(os.path.join(REFERENCE_ROOT,
                           "Temperature/MixedColorBlack_Model/calibration_out/models_final_summary_metrics.json")) as f:
        gold = json.load(f)["models_final"]
    for name in ("heating", "cooling", "global"):
        o = out["models_final"][name]
        g = gold[name]
        assert o["degree"] == g["degree"], name
        assert abs(o["metrics_frames"]["rmse_C"] - g["metrics_frames"]["rmse_C"]) < 0.15, name
        # two-sided: a suspiciously *low* means-RMSE would flag degree-selection
        # drift / overfit just as much as a high one (validated run: heating
        # 3.065 vs 3.064, cooling 2.776 vs 2.780, global 1.870 vs 1.927)
        assert abs(o["metrics_means"]["rmse_C"] - g["metrics_means"]["rmse_C"]) < 0.15, name


def test_p2h_trainer_reproduces_reference_constants(tmp_path):
    """Phase->height trainer end-to-end (4 FTP runs + fit): canonical hinge
    constants match the reference's curve (a=2.083, b=4.204, c~0)."""
    import json
    from vistaf_tpu.trainers import phase_to_height as t
    out = t.train(
        os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_reference.jpg"),
        t.DEFAULT_CALIBRATION_SAMPLES,
        os.path.join(REFERENCE_ROOT, "Force/Phase_to_height"),
        str(tmp_path))
    best = out["best_model"]
    assert best["type"] == "hinge_saturating"
    # same curve in the canonical basin; fit quality at least as good
    assert abs(best["params"]["a"] - 2.0826) < 0.05
    assert abs(best["params"]["b"] - 4.2044) < 0.1
    assert abs(best["params"]["c"]) < 0.01
    assert best["rmse"] <= 0.0030

"""Trainer tests: fast synthetic paths + slow golden re-fits."""
import json
import os

import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, reference_available


def test_p2h_trainer_config_variant():
    from vistaf_tpu.trainers.phase_to_height import trainer_ftp_config
    cfg = trainer_ftp_config()
    assert cfg.roi_erode_px == 80
    assert cfg.frontier_zero_band_px == 300
    assert not cfg.auto_flip_sign
    assert not cfg.output_height_in_mm
    assert not cfg.remove_global_plane_before_detrend


def test_fit_best_reproduces_reference_h2f_constants():
    """Re-fit the volume->force model from the reference's own committed
    per-image corpus; must land on the same growth model and constants
    (BASELINE.md: F = 1.61977*(exp(9.75663*V)-1))."""
    if not reference_available():
        pytest.skip("reference data not mounted")
    import csv
    from vistaf_tpu.calib import fitting
    rows = list(csv.DictReader(open(os.path.join(
        REFERENCE_ROOT, "Force/Height_to_force/calibration_out/per_image_results.csv"))))
    V = np.array([float(r["volume_cm3"]) for r in rows])
    F = np.array([float(r["force_N"]) for r in rows])
    V_fit = np.concatenate([np.zeros(20), V])
    F_fit = np.concatenate([np.zeros(20), F])
    best, summary = fitting.fit_best_model(
        V_fit, F_fit, ("linear0", "linear", "poly2", "sat_exp", "growth", "hinge_saturating"))
    gold = json.load(open(os.path.join(
        REFERENCE_ROOT, "Force/Height_to_force/calibration_out/calibration_model.json")))["best_model"]
    assert best["type"] == gold["type"] == "growth"
    np.testing.assert_allclose(best["params"]["a"], gold["params"]["a"], rtol=1e-3)
    np.testing.assert_allclose(best["params"]["b"], gold["params"]["b"], rtol=1e-3)
    np.testing.assert_allclose(best["rmse"], gold["rmse"], rtol=1e-3)


def test_fit_best_reproduces_reference_p2h_constants():
    """Re-fit phase->height from the reference's committed per-image minima."""
    if not reference_available():
        pytest.skip("reference data not mounted")
    import csv
    from vistaf_tpu.calib import fitting
    path = os.path.join(REFERENCE_ROOT,
                        "Force/Phase_to_height/calibration_out/calibration_results.csv")
    rows = list(csv.DictReader(open(path)))
    x = np.maximum(-np.array([float(r["min_height_unitless"]) for r in rows]), 0.0)
    y = np.array([float(r["depth_mm"]) for r in rows])
    best, _ = fitting.fit_best_model(x, y, ("hinge_saturating", "growth"))
    gold = json.load(open(os.path.join(
        REFERENCE_ROOT, "Force/Phase_to_height/calibration_out/calibration_model.json")))["best_model"]
    # n=4 exponential fits are degenerate in parameter space; require the
    # same family choice and equal-or-better fit quality
    assert best["type"] == gold["type"] == "hinge_saturating"
    assert best["rmse"] <= gold["rmse"] * 1.05


def test_pretest_stabilization_detector():
    from vistaf_tpu.trainers.pretest import detect_stabilization_time
    v = np.concatenate([np.linspace(100, 140, 20), np.full(12, 140.0)])
    v += np.random.default_rng(0).normal(scale=0.2, size=len(v))
    out = detect_stabilization_time(v, dt_s=20.0)
    assert out is not None
    assert 14 <= out["index"] <= 21
    assert out["time_s"] == out["index"] * 20.0


def test_michelson_contrast_reference_values():
    from vistaf_tpu.utils.michelson import michelson_contrast, SKIN_BLACK
    # white vs skin black: the notebook reports ~0.938 (SURVEY.md C18)
    c_white = michelson_contrast((255, 255, 255), SKIN_BLACK)
    assert abs(c_white - 0.938) < 0.01
    assert michelson_contrast((50, 50, 51), SKIN_BLACK) < 0.01

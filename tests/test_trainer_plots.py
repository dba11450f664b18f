"""Trainer diagnostic-artifact contract: each trainer must leave the
reference's exact figure/CSV filename set behind
(``temperature_color_model.py:778-962``, ``temperature_black_model.py:811-996``,
``height_to_force.py:459-532``, ``phase_to_height.py:1522-1571``,
``pretest_25to30.py:139-190``).

Fast synthetic runs only — the slow golden re-fits in
``test_golden_trainers.py`` exercise the same exports on the real datasets.
"""
import os

import numpy as np
import pytest

# Small annulus geometry for 64x64 synthetic frames.
INNER = ((22, 32), (42, 32), (32, 42))
OUTER = ((7, 32), (57, 32), (32, 57))

COLOR_FIG_SET = (
    "00_roi_overlay.png",
    "01_heating_L_vs_T_modelcurve.png",
    "02_cooling_L_vs_T_modelcurve.png",
    "03_hysteresis_L_vs_T_models.png",
    "05_global_true_vs_pred.png",
    "06_global_L_vs_T_all_trend.png",
    "07_global_per_temp_error.csv",
    "08_global_mae_vs_T.png",
)
BLACK_FIG_SET = (
    "00_roi_overlay.png",
    "01_heating_gray_vs_T_modelcurve.png",
    "02_cooling_gray_vs_T_modelcurve.png",
    "03_hysteresis_gray_vs_T_models.png",
    "05_global_true_vs_pred.png",
    "06_global_gray_vs_T_all_modelcurve.png",
)


def _write_series(dirpath, stem, temps, frames_per_temp):
    """Tiny frames whose color tracks temperature so the fits are sane."""
    import cv2
    rng = np.random.default_rng(0)
    i = 1
    for t in temps:
        for _ in range(frames_per_temp):
            base = np.full((64, 64, 3), 60 + 4 * (t - temps[0]), np.float64)
            img = np.clip(base + rng.normal(scale=2.0, size=base.shape), 0, 255)
            cv2.imwrite(os.path.join(dirpath, f"{stem}-{i}.jpg"),
                        img.astype(np.uint8))
            i += 1


def _assert_files(out_dir, names):
    missing = [n for n in names if not os.path.exists(os.path.join(out_dir, n))
               or os.path.getsize(os.path.join(out_dir, n)) == 0]
    assert not missing, f"missing/empty artifacts: {missing}"


def test_color_trainer_filename_set(tmp_path):
    from vistaf_tpu.trainers import temperature_color as t
    heat = tmp_path / "heat"
    cool = tmp_path / "cool"
    out = tmp_path / "out"
    heat.mkdir(); cool.mkdir()
    temps = list(range(20, 27))  # 7 temps >= cv_splits=6 groups
    _write_series(str(heat), "heating", temps, 2)
    _write_series(str(cool), "cooling", list(reversed(temps)), 2)
    t.train(str(heat / "heating-*.jpg"), str(cool / "cooling-*.jpg"), str(out),
            temps_heating=temps, frames_per_temp=2,
            fit_temp_range=(temps[0], temps[-1]),
            degree_candidates=(1, 2),
            inner_circle=INNER, outer_circle=OUTER)
    _assert_files(str(out), COLOR_FIG_SET)
    _assert_files(str(out), ("models_final_summary_metrics.json",
                             "equations_color_models_final.txt"))
    # per-temp error CSV has one row per unique temperature
    rows = open(out / "07_global_per_temp_error.csv").read().strip().splitlines()
    assert len(rows) == 1 + len(temps)


def test_black_trainer_filename_set(tmp_path):
    from vistaf_tpu.trainers import temperature_black as t
    heat = tmp_path / "heat"
    cool = tmp_path / "cool"
    out = tmp_path / "out"
    heat.mkdir(); cool.mkdir()
    temps = list(range(20, 27))
    _write_series(str(heat), "heating_mixed", temps, 2)
    _write_series(str(cool), "cooling_mixed", list(reversed(temps)), 2)
    t.train(str(heat / "heating_mixed-*.jpg"), str(cool / "cooling_mixed-*.jpg"),
            str(out), temps_heating=temps, frames_per_temp=2,
            degree_candidates=(1, 2), pixels_per_image=64,
            inner_circle=INNER, outer_circle=OUTER)
    _assert_files(str(out), BLACK_FIG_SET)
    _assert_files(str(out), ("models_final_summary_metrics.json",
                             "equations_black_models_final.txt"))


def test_h2f_plot_filename_set(tmp_path):
    from vistaf_tpu.trainers.plots import save_h2f_plots
    levels = [0.5, 1.0, 2.0]
    rows = [{"volume_cm3": 0.01 * f + 0.001 * k, "force_N": f}
            for f in levels for k in range(5)]
    save_h2f_plots(str(tmp_path), rows, lambda xs: 100.0 * np.asarray(xs), levels)
    _assert_files(str(tmp_path), ("volume_by_force_boxplot.png",
                                  "force_vs_volume_fit.png"))


def test_p2h_plot_filename_set(tmp_path):
    from vistaf_tpu.trainers.plots import save_p2h_plot
    x = np.array([0.9, 1.0, 1.05, 1.1])
    y = np.array([1.91, 1.95, 2.02, 2.07])
    save_p2h_plot(str(tmp_path), x, y, lambda xs: 2.08 * (1 - np.exp(-4.2 * np.asarray(xs))))
    _assert_files(str(tmp_path), ("calibration_plot.png",))


def test_pretest_figure_export(tmp_path):
    import cv2
    from vistaf_tpu.trainers import pretest
    series = tmp_path / "series"
    series.mkdir()
    rng = np.random.default_rng(1)
    vals = np.concatenate([np.linspace(80, 140, 12), np.full(8, 140.0)])
    for i, v in enumerate(vals, start=1):
        img = np.clip(np.full((32, 32, 3), v) + rng.normal(scale=0.3, size=(32, 32, 3)),
                      0, 255).astype(np.uint8)
        cv2.imwrite(str(series / f"img-{i}.jpg"), img)
    mask = np.ones((32, 32), bool)
    out = pretest.analyze(str(series / "img-*.jpg"), mask, dt_s=20.0,
                          out_dir=str(tmp_path), label="25to30")
    assert out["stabilization"] is not None
    _assert_files(str(tmp_path), ("Figure_1_pretest_25to30.png",))
    assert out["figure_path"].endswith("Figure_1_pretest_25to30.png")

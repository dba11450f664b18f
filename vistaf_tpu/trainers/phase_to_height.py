"""Phase->height calibration trainer.

TPU counterpart of ``phase_to_height.py``: run the FTP engine (trainer
variant: ROI eroded by 80 px, 300 px frontier band, no plane removal, no
sign flip, unitless output) over known-depth indentations, take each image's
minimum unitless height, and fit depth_mm = f(-min_height) over the model
candidates; write ``calibration_model.json`` + ``calibration_results.csv``
with the reference schema (``phase_to_height.py:1441-1583``).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vistaf_tpu.calib import fitting
from vistaf_tpu.calib.artifacts import save_json
from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.runner import io

# Reference trainer sample list (phase_to_height.py:36-41): real depths by
# forcing the 0-point reference.
DEFAULT_CALIBRATION_SAMPLES = (
    ("Height_0.5mm_deformed.jpg", 1.90935),
    ("Height_1mm_deformed.jpg", 1.94770),
    ("Height_1.5mm_deformed.jpg", 2.01821),
    ("Height_2mm_deformed.jpg", 2.07255),
)

MODEL_CANDIDATES = ("hinge_saturating", "growth")


def trainer_ftp_config(base: Optional[FTPConfig] = None) -> FTPConfig:
    """FTP variant used by the trainer (``phase_to_height.py:56-146``)."""
    cfg = base or FTPConfig()
    return cfg.replace(
        roi_erode_px=80,
        frontier_zero_band_px=300,
        remove_global_plane_before_detrend=False,
        auto_flip_sign=False,
        output_height_in_mm=False,
        filter_small_contact_blobs=False,
        fill_internal_holes_in_reliable=False,
    )


def compute_min_height(height_final: np.ndarray, mask: np.ndarray):
    """(min value, (x, y)) over the masked finite heightmap
    (``phase_to_height.py:1009-1016``)."""
    m = mask & np.isfinite(height_final)
    if not m.any():
        return float("nan"), None
    tmp = np.where(m, height_final, np.inf)
    iy, ix = np.unravel_index(int(np.argmin(tmp)), tmp.shape)
    return float(height_final[iy, ix]), (int(ix), int(iy))


def train(reference_path: str, samples: Sequence[Tuple[str, float]],
          deformed_dir: str, output_dir: str,
          ftp_cfg: Optional[FTPConfig] = None,
          use_negated_height: bool = True,
          anchor_origin: bool = False, origin_weight: int = 20,
          model_candidates: Sequence[str] = MODEL_CANDIDATES) -> Dict:
    """Run the batch calibration; returns the model JSON dict."""
    io.ensure_dir(output_dir)
    cfg = trainer_ftp_config(ftp_cfg)
    dummy_model = {"type": "linear0", "params": {"a": 1.0}}
    pipe = FTPPipeline(cfg, dummy_model, use_negated_height)

    ref_bgr = io.imread_bgr(reference_path)
    rows: List[Dict] = []
    xs: List[float] = []
    ys: List[float] = []
    for fname, depth in samples:
        path = os.path.join(deformed_dir, fname)
        if not os.path.isfile(path):
            continue
        def_bgr = io.imread_bgr(path)
        res = pipe(ref_bgr, def_bgr)
        min_val, min_xy = compute_min_height(res["height_map_unitless_crop"],
                                             res["roi_eroded_crop"])
        rows.append({
            "file": fname, "depth_mm": float(depth),
            "min_height_unitless": float(min_val),
            "min_x": min_xy[0] if min_xy else -1,
            "min_y": min_xy[1] if min_xy else -1,
        })
        if np.isfinite(min_val):
            xs.append(min_val)
            ys.append(float(depth))

    if len(xs) < 2:
        raise RuntimeError("Not enough valid samples to fit a model (need at least 2).")

    x = -np.asarray(xs, float) if use_negated_height else np.asarray(xs, float)
    x = np.maximum(x, 0.0)
    y = np.asarray(ys, float)
    if anchor_origin:
        w = max(1, int(origin_weight))
        x = np.concatenate([np.zeros(w), x])
        y = np.concatenate([np.zeros(w), y])

    best, summary = fitting.fit_best_model(x, y, model_candidates)

    csv_path = os.path.join(output_dir, "calibration_results.csv")
    with open(csv_path, "w", encoding="utf-8") as f:
        f.write("file,depth_mm,min_height_unitless,min_x,min_y\n")
        for r in rows:
            f.write(f"{r['file']},{r['depth_mm']},{r['min_height_unitless']},"
                    f"{r['min_x']},{r['min_y']}\n")

    model_out = {
        "reference_path": reference_path,
        "deformed_dir": deformed_dir,
        "output_dir": output_dir,
        "use_negated_height_for_fit": bool(use_negated_height),
        "x_definition": ("x = -min_height_unitless" if use_negated_height
                         else "x = min_height_unitless"),
        "best_model": {
            "type": best["type"],
            "params": best["params"],
            "equation": best["equation"],
            "r2": float(best["r2"]),
            "rmse": float(best["rmse"]),
            "sse": float(best["sse"]),
            "n": int(len(x)),
        },
        "candidates_summary": summary,
        "interpretation": (
            "This model maps unitless heightmap values to mm. "
            "If use_negated_height_for_fit=true, it uses x=-height_unitless."
        ),
    }
    save_json(os.path.join(output_dir, "calibration_model.json"), model_out)

    # calibration-curve plot (phase_to_height.py:1548-1571)
    from vistaf_tpu.calib.scalar_models import predict as model_predict
    from vistaf_tpu.trainers import plots
    plots.save_p2h_plot(output_dir, x, y,
                        lambda xs: model_predict(best, xs, xp=np),
                        use_negated=use_negated_height)
    return model_out

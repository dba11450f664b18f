"""Calibration artifact I/O — JSON schemas kept verbatim for API parity.

The reference artifact contract (SURVEY.md §5 checkpoint/resume):
``calibration_model.json`` with ``best_model {type, params, equation, rmse,
r2, ...}``; loaders mirror ``shape_ftp.py:672-680`` and
``force_sensor.py:142-147``.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple


def load_phase_to_height(json_path: str) -> Tuple[Dict[str, Any], bool]:
    """Returns (best_model, use_negated_height)  (``shape_ftp.py:672-680``)."""
    with open(json_path, "r", encoding="utf-8") as f:
        cal = json.load(f)
    model = cal["best_model"]
    use_neg = bool(cal.get("use_negated_height_for_fit", True))
    return model, use_neg


def load_force_calibration(json_path: str) -> Dict[str, Any]:
    """Full force-calibration dict; raises if ``best_model`` is missing
    (``force_sensor.py:142-147``)."""
    with open(json_path, "r", encoding="utf-8") as f:
        data = json.load(f)
    if "best_model" not in data:
        raise ValueError("Invalid force calibration JSON: missing 'best_model'")
    return data


def save_json(path: str, obj: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump(obj, f, indent=2)


def load_json(path: str) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        return json.load(f)


def load_json_safe(path: str):
    """``multimodal_sensor.load_json_safe`` semantics
    (``multimodal_sensor.py:104-113``): None on missing/corrupt."""
    if not os.path.exists(path):
        return None
    try:
        return load_json(path)
    except Exception:
        return None

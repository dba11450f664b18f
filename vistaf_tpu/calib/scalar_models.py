"""Scalar calibration model zoo: y = f(x) families shared by the
phase→height and volume→force calibrations.

Reference implements these three times over (``phase_to_height.py:1082-1332``,
``height_to_force.py:113-237``, ``force_sensor.py:129-167``); here is the one
shared, jnp-traceable implementation.  ``predict`` works on jnp or numpy
arrays; parameters travel as plain dicts matching the reference JSON schema
``{"type": ..., "params": {...}}``.
"""
from __future__ import annotations

from typing import Dict, Any

import math

import jax.numpy as jnp


MODEL_TYPES = (
    "linear0", "linear_through_origin", "linear", "poly2", "exp", "power",
    "sat_exp", "sat_exp_shift", "growth", "hinge_saturating",
)


def predict(model: Dict[str, Any], x, xp=jnp):
    """Evaluate a fitted scalar model at x (array-like).

    Supports the reference's optional ``origin_correction`` offset
    (``phase_to_height.py:1385-1428``).
    """
    t = model["type"]
    p = model["params"]
    offset = float(model.get("origin_correction", 0.0))
    x = xp.asarray(x, dtype=xp.float32 if xp is jnp else float)

    if t in ("linear0", "linear_through_origin"):
        out = float(p["a"]) * x
    elif t == "linear":
        out = float(p["a"]) * x + float(p["b"])
    elif t == "poly2":
        c0 = float(p["c0"]); c1 = float(p["c1"]); c2 = float(p["c2"])
        out = c2 * x * x + c1 * x + c0
    elif t == "exp":
        out = float(p["a"]) * xp.exp(float(p["b"]) * x)
    elif t == "power":
        out = float(p["a"]) * x ** float(p["b"])
    elif t == "sat_exp":
        out = float(p["a"]) * (1.0 - xp.exp(-float(p["b"]) * xp.maximum(x, 0.0)))
    elif t == "sat_exp_shift":
        a = float(p["a"]); b = float(p["b"]); x0 = float(p["x0"])
        g = 1.0 - xp.exp(-b * xp.maximum(x - x0, 0.0))
        g0 = 1.0 - math.exp(-b * max(0.0 - x0, 0.0))
        out = a * (g - g0)
    elif t == "growth":
        # force-sensor semantics clamp the argument at 0 (force_sensor.py:133)
        out = float(p["a"]) * (xp.exp(float(p["b"]) * xp.maximum(x, 0.0)) - 1.0)
    elif t == "hinge_saturating":
        a = float(p["a"]); b = float(p["b"]); c = float(p["c"])
        g = 1.0 - xp.exp(-b * xp.maximum(x - c, 0.0))
        g0 = 1.0 - math.exp(-b * max(0.0 - c, 0.0))
        out = a * (g - g0)
    else:
        raise ValueError(f"Unknown model type: {t}")
    return out - offset


def predict_force_from_volume(model: Dict[str, Any], volume_cm3, xp=jnp):
    """Force model evaluation with the force-sensor's x>=0 clamp semantics
    (``force_sensor.py:129-167``): sat_exp/growth/hinge clamp internally;
    linear families evaluate raw."""
    return predict(model, volume_cm3, xp=xp)


def height_unitless_to_depth_mm(height_unitless, model: Dict[str, Any],
                                use_negated_height: bool = True, xp=jnp):
    """Unitless FTP height -> physical depth in mm
    (``shape_ftp.py:702-705``): evaluates f on x = -h (clamped to >= 0 by the
    model family)."""
    h = xp.asarray(height_unitless, dtype=xp.float32 if xp is jnp else float)
    x = -h if use_negated_height else h
    x = xp.maximum(x, 0.0)
    return predict(model, x, xp=xp)

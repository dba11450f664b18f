"""Temperature model weights: sklearn pipelines exported to plain arrays.

The reference ships its TLC temperature models as joblib-pickled sklearn
pipelines (StandardScaler -> PolynomialFeatures -> HuberRegressor, optionally
an IsotonicRegression calibrator) and evaluates them per pixel through
sklearn (``temperature_sensor.py:229-263``, SURVEY.md §5 checkpoint/resume).
Here the fitted parameters are exported once into a plain weight pytree so
inference is a fused jnp polynomial evaluation — no sklearn, no Python loop,
millions of pixels per call on the VPU.
"""
from __future__ import annotations

import dataclasses
import glob
import os
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class TempModelWeights:
    """Plain-array export of one temperature regression pipeline."""
    name: str
    feature_names: Tuple[str, ...]       # e.g. ("L","a","b") or ("L","a","b","gray")
    scaler_mean: np.ndarray              # (F,)
    scaler_scale: np.ndarray             # (F,)
    powers: np.ndarray                   # (P, F) int exponent table
    coef: np.ndarray                     # (P,)
    intercept: float
    poly_degree: int
    iso_x: Optional[np.ndarray] = None   # isotonic thresholds (increasing)
    iso_y: Optional[np.ndarray] = None

    def predict(self, X: jnp.ndarray) -> jnp.ndarray:
        """Evaluate on features X of shape (..., F) -> (...,) float32.

        Matches sklearn: scale, monomial expansion per the fitted exponent
        table, linear combination, optional isotonic interpolation (clip
        out-of-bounds).
        """
        Xs = (X - jnp.asarray(self.scaler_mean, jnp.float32)) / jnp.asarray(self.scaler_scale, jnp.float32)
        out = jnp.full(X.shape[:-1], jnp.float32(self.intercept))
        powers = np.asarray(self.powers)
        coef = np.asarray(self.coef)
        for p in range(powers.shape[0]):
            c = float(coef[p])
            if c == 0.0:
                continue
            term = None
            for f in range(powers.shape[1]):
                e = int(powers[p, f])
                if e == 0:
                    continue
                v = Xs[..., f]
                contrib = v
                for _ in range(e - 1):
                    contrib = contrib * v
                term = contrib if term is None else term * contrib
            out = out + c if term is None else out + c * term
        if self.iso_x is not None:
            out = jnp.interp(out, jnp.asarray(self.iso_x, jnp.float32),
                             jnp.asarray(self.iso_y, jnp.float32))
        return out.astype(jnp.float32)

    # ------------------------------------------------------------------
    def save_npz(self, path: str) -> None:
        d = {
            "feature_names": np.array(self.feature_names),
            "scaler_mean": self.scaler_mean,
            "scaler_scale": self.scaler_scale,
            "powers": self.powers,
            "coef": self.coef,
            "intercept": np.float64(self.intercept),
            "poly_degree": np.int32(self.poly_degree),
            "name": np.array(self.name),
        }
        if self.iso_x is not None:
            d["iso_x"] = self.iso_x
            d["iso_y"] = self.iso_y
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, **d)

    @staticmethod
    def load_npz(path: str) -> "TempModelWeights":
        z = np.load(path, allow_pickle=False)
        return TempModelWeights(
            name=str(z["name"]),
            feature_names=tuple(str(s) for s in z["feature_names"]),
            scaler_mean=z["scaler_mean"].astype(np.float64),
            scaler_scale=z["scaler_scale"].astype(np.float64),
            powers=z["powers"].astype(np.int32),
            coef=z["coef"].astype(np.float64),
            intercept=float(z["intercept"]),
            poly_degree=int(z["poly_degree"]),
            iso_x=z["iso_x"] if "iso_x" in z else None,
            iso_y=z["iso_y"] if "iso_y" in z else None,
        )


def poly_powers(n_features: int, degree: int) -> np.ndarray:
    """sklearn PolynomialFeatures(include_bias=True) exponent table, in
    sklearn's term order (graded lexicographic as produced by its
    combinations-with-replacement enumeration)."""
    from itertools import combinations_with_replacement
    rows = [np.zeros(n_features, np.int32)]
    for d in range(1, degree + 1):
        for combo in combinations_with_replacement(range(n_features), d):
            e = np.zeros(n_features, np.int32)
            for i in combo:
                e[i] += 1
            rows.append(e)
    return np.stack(rows)


def from_joblib(path: str, name: str = "model") -> TempModelWeights:
    """Export a reference joblib bundle ({model, use_features,
    isotonic_calibrator, ...}) into plain weights."""
    import joblib
    obj = joblib.load(path)
    if not (isinstance(obj, dict) and "model" in obj):
        raise RuntimeError(f"Unrecognized joblib format: {path}")
    pipe = obj["model"]
    feat = tuple(obj["use_features"])
    sc = pipe.named_steps["standardscaler"]
    poly = pipe.named_steps["polynomialfeatures"]
    hub = pipe.named_steps["huberregressor"]
    iso = obj.get("isotonic_calibrator", None)
    iso_x = iso_y = None
    if iso is not None:
        iso_x = np.asarray(iso.X_thresholds_, np.float64)
        iso_y = np.asarray(iso.y_thresholds_, np.float64)
    return TempModelWeights(
        name=str(obj.get("name", name)),
        feature_names=feat,
        scaler_mean=np.asarray(sc.mean_, np.float64),
        scaler_scale=np.asarray(sc.scale_, np.float64),
        powers=np.asarray(poly.powers_, np.int32),
        coef=np.asarray(hub.coef_, np.float64).ravel(),
        intercept=float(np.ravel(hub.intercept_)[0]),
        poly_degree=int(poly.degree),
        iso_x=iso_x,
        iso_y=iso_y,
    )


def resolve_latest(pattern: str) -> str:
    """Newest-by-mtime artifact resolution (``temperature_sensor.py:128-139``)."""
    matches = glob.glob(pattern)
    if not matches:
        raise RuntimeError(f"No model matches pattern: {pattern}")
    return max(matches, key=os.path.getmtime)


def load_reference_models(data_root: str) -> Tuple[TempModelWeights, TempModelWeights]:
    """(color_model, wide_model) from a reference-layout data root."""
    from vistaf_tpu import config as C
    color = from_joblib(resolve_latest(os.path.join(data_root, C.TEMP_COLOR_MODEL_GLOB)), "color_model")
    wide = from_joblib(resolve_latest(os.path.join(data_root, C.TEMP_WIDE_MODEL_GLOB)), "wide_model")
    if color.feature_names != ("L", "a", "b"):
        raise RuntimeError(f"Color model must use (L,a,b), got {color.feature_names}")
    if wide.feature_names != ("L", "a", "b", "gray"):
        raise RuntimeError(f"Wide model must use (L,a,b,gray), got {wide.feature_names}")
    return color, wide

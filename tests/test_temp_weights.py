import os
import numpy as np
import pytest
import jax.numpy as jnp

from vistaf_tpu.calib import temp_weights
from tests.conftest import REFERENCE_ROOT, reference_available


def test_poly_powers_matches_sklearn():
    from sklearn.preprocessing import PolynomialFeatures
    for nf, deg in [(3, 2), (4, 3), (3, 4)]:
        pf = PolynomialFeatures(degree=deg, include_bias=True)
        pf.fit(np.zeros((2, nf)))
        ours = temp_weights.poly_powers(nf, deg)
        np.testing.assert_array_equal(ours, pf.powers_)


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_joblib_export_matches_sklearn_predict(rng):
    color, wide = temp_weights.load_reference_models(REFERENCE_ROOT)
    import joblib
    cobj = joblib.load(temp_weights.resolve_latest(
        os.path.join(REFERENCE_ROOT, "Temperature/Colored_Model/calibration_out/color_model_global_huber_deg*.joblib")))
    wobj = joblib.load(temp_weights.resolve_latest(
        os.path.join(REFERENCE_ROOT, "Temperature/MixedColorBlack_Model/calibration_out/black_model_global_huber_deg*.joblib")))

    Xc = rng.random((500, 3)).astype(np.float32) * np.array([255, 60, 60]) + np.array([0, 100, 70])
    ref_pred = cobj["model"].predict(Xc).astype(np.float32)
    if cobj.get("isotonic_calibrator") is not None:
        ref_pred = cobj["isotonic_calibrator"].predict(ref_pred).astype(np.float32)
    ours = np.asarray(color.predict(jnp.asarray(Xc)))
    np.testing.assert_allclose(ours, ref_pred, rtol=1e-4, atol=1e-3)

    Xw = rng.random((500, 4)).astype(np.float32) * np.array([255, 30, 30, 255]) + np.array([0, 110, 100, 0])
    ref_pred_w = wobj["model"].predict(Xw).astype(np.float32)
    ours_w = np.asarray(wide.predict(jnp.asarray(Xw)))
    np.testing.assert_allclose(ours_w, ref_pred_w, rtol=1e-4, atol=1e-2)


@pytest.mark.skipif(not reference_available(), reason="reference data not mounted")
def test_weights_npz_roundtrip(tmp_path):
    color, _ = temp_weights.load_reference_models(REFERENCE_ROOT)
    p = str(tmp_path / "color.npz")
    color.save_npz(p)
    loaded = temp_weights.TempModelWeights.load_npz(p)
    assert loaded.feature_names == color.feature_names
    np.testing.assert_array_equal(loaded.coef, color.coef)
    x = jnp.asarray(np.array([[150.0, 160.0, 95.0]], np.float32))
    np.testing.assert_allclose(np.asarray(loaded.predict(x)), np.asarray(color.predict(x)), rtol=1e-6)

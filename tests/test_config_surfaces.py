"""BASELINE configs 2/3 surfaces: per-taxel contact classification and the
displacement-field -> normal-force-map head (pipelines/force.py)."""
import jax
import numpy as np
import pytest

from vistaf_tpu.config import ForceConfig
from vistaf_tpu.pipelines.force import ForcePipeline
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

P2H = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
F_MODEL = {"type": "growth", "params": {"a": 1.61977, "b": 9.75663}}


@pytest.fixture(scope="module")
def pipe_and_frames():
    H, W = 480, 640
    cfg = scaled_ftp_config(H, W)
    pipe = ForcePipeline(cfg, ForceConfig(), P2H, F_MODEL)
    ref, de = synthetic_pair(H, W, cfg)
    return pipe, np.asarray(ref), np.asarray(de)


def test_contact_classification_matches_scalar_outputs(pipe_and_frames):
    pipe, ref, de = pipe_and_frames
    fn = jax.jit(pipe.contact_classification_device())
    contact, area, depth = fn(ref, de)
    out = pipe(ref, de, roi_from_finite=True)
    # the classifier is the same decision the volume integration thresholds
    np.testing.assert_allclose(float(area), out["contact_area_mm2"],
                               rtol=1e-5, atol=1e-5)
    contact = np.asarray(contact)
    assert contact.dtype == bool and contact.any()
    d = np.asarray(depth)
    assert (d[contact] > pipe.force_cfg.depth_eps_mm).all()
    assert (d[~contact] <= pipe.force_cfg.depth_eps_mm).all()


def test_force_map_sums_to_calibrated_force(pipe_and_frames):
    pipe, ref, de = pipe_and_frames
    fn = jax.jit(pipe.force_map_device())
    force_map, disp, force_n = fn(ref, de)
    out = pipe(ref, de, roi_from_finite=True)
    np.testing.assert_allclose(float(force_n), out["force_N"],
                               rtol=1e-5, atol=1e-6)
    fm = np.asarray(force_map)
    # decomposition sums exactly to the scalar calibrated output
    np.testing.assert_allclose(fm.sum(), float(force_n), rtol=1e-4)
    assert (fm >= 0).all()
    # force concentrates where the indentation is
    d = np.asarray(disp)
    deepest = np.unravel_index(np.abs(d).argmax(), d.shape)
    assert fm[deepest] > 0


def test_evidence_scalars_bit_match_full_map_path(pipe_and_frames):
    """The scalar-fetch evidence surface (evidence_reductions_device +
    host_volume_from_reductions) must reproduce __call__'s volume/area/
    depth/force exactly — the corpus/goldens harnesses rely on it being a
    fetch-shape change, not a numerics change."""
    import jax.numpy as jnp
    pipe, ref, de = pipe_and_frames
    for roi_finite in (True, False):
        jfn = jax.jit(pipe.evidence_reductions_device(roi_from_finite=roi_finite))
        ev = pipe.evidence_scalars(jnp.asarray(ref), jnp.asarray(de), jfn)
        out = pipe(ref, de, roi_from_finite=roi_finite)
        for k in ("volume_cm3", "contact_area_mm2", "max_depth_mm", "force_N"):
            assert ev[k] == pytest.approx(out[k], rel=1e-6, abs=1e-9), (roi_finite, k)
        assert ev["estimated_grating_period_px"] == pytest.approx(
            out["estimated_grating_period_px"], rel=1e-6)

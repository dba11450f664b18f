"""Oriented anisotropic blur: the gather-free shear rotation path
(TempConfig.rotate_method='shear', the deploy default) must agree with the
bilinear-gather path it replaces (reference: temperature_sensor.py:705-742).

The gather rotations were ~577 of ~690 ms of the native-4K temperature
latency (scripts/profile_temp4k.py); the shear path is pure shift-selects.
Interpolation differs (separable 2-tap shears vs true bilinear) so interiors
agree to ~0.05 degC while the ROI-fringe staircase may differ by more —
both gated separately; the end-to-end deploy gate is GOLDENS (dmean 0.1 C).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from vistaf_tpu.temperature.inference import oriented_gaussian_blur


def _scene(rng, h=160, w=200):
    import cv2
    base = cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 5)
    m0 = base * 10.0 + 22.0
    roi = np.zeros((h, w), np.uint8)
    cv2.circle(roi, (w // 2, h // 2), min(h, w) // 2 - 18, 1, -1)
    interior = cv2.erode(roi, np.ones((17, 17), np.uint8)).astype(bool)
    roi = roi.astype(bool)
    m = np.where(roi, m0, np.nan).astype(np.float32)
    return jnp.asarray(m), jnp.asarray(roi), interior


# 1.2/-1.45/2.3 exercise the quarter-turn fold (|angle| > 50 deg rotation)
@pytest.mark.parametrize("angle_rad", [0.0, 0.17, -0.42, 0.72,
                                       1.2, -1.45, 2.3])
def test_shear_matches_gather(rng, angle_rad):
    m, roi, interior = _scene(rng)
    gold = np.asarray(oriented_gaussian_blur(m, roi, jnp.float32(angle_rad),
                                             6.0, 1.0, method="gather"))
    ours = np.asarray(oriented_gaussian_blur(m, roi, jnp.float32(angle_rad),
                                             6.0, 1.0, method="shear"))
    both = np.isfinite(gold) & np.isfinite(ours)
    # validity fringes may differ by ~1 px of shear staircase
    assert np.mean(np.isfinite(gold) != np.isfinite(ours)) < 0.01
    err = np.abs(gold[both] - ours[both])
    assert np.median(err) < 0.01
    assert err.max() < 2.0   # fringe staircase px on steep local contrast
    ierr = np.abs(gold[both & interior] - ours[both & interior])
    assert ierr.max() < 0.1, float(ierr.max())

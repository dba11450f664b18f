import numpy as np
import cv2
import jax.numpy as jnp

from vistaf_tpu.ops import color


def test_bgr_to_gray_matches_cv2(rng):
    img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    ours = np.asarray(color.bgr_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32)
    # cv2 uses fixed-point; allow 1 LSB
    assert np.abs(ours - ref).max() <= 1.0
    assert np.mean(np.abs(ours - ref) > 0.5) < 0.02


def test_bgr_to_lab_matches_cv2(rng):
    img = (rng.random((48, 64, 3)) * 255).astype(np.uint8)
    ours = np.asarray(color.bgr_to_lab_u8(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_BGR2LAB).astype(np.float32)
    err = np.abs(ours - ref)
    # cv2's 8-bit LAB path is LUT-quantized; stay within ~2 LSB everywhere
    assert err.max() <= 2.0, err.max()
    assert err.mean() < 0.5

import numpy as np
import cv2
import jax.numpy as jnp

from vistaf_tpu.ops import morphology


def test_ellipse_kernel_matches_cv2():
    for k in [3, 5, 7, 13, 15, 31]:
        ours = morphology.ellipse_kernel(k, k)
        ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k)) > 0
        np.testing.assert_array_equal(ours, ref)


def test_rect_kernel_anisotropic():
    ours = morphology.rect_kernel(31, 3)
    ref = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 31)) > 0
    np.testing.assert_array_equal(ours, ref)


def test_dilate_erode_match_cv2(rng):
    mask = (rng.random((60, 70)) > 0.7)
    for k in [3, 5, 7]:
        fp = morphology.ellipse_kernel(k, k)
        cvk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        u8 = mask.astype(np.uint8) * 255

        ours_d = np.asarray(morphology.dilate(jnp.asarray(mask), fp))
        ref_d = cv2.dilate(u8, cvk) > 0
        np.testing.assert_array_equal(ours_d, ref_d)

        ours_e = np.asarray(morphology.erode(jnp.asarray(mask), fp))
        ref_e = cv2.erode(u8, cvk) > 0
        np.testing.assert_array_equal(ours_e, ref_e)


def test_close_open_match_cv2(rng):
    mask = (rng.random((50, 64)) > 0.6)
    u8 = mask.astype(np.uint8) * 255
    fp = morphology.ellipse_kernel(7, 7)
    cvk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))

    ours_c = np.asarray(morphology.close(jnp.asarray(mask), fp))
    ref_c = cv2.morphologyEx(u8, cv2.MORPH_CLOSE, cvk) > 0
    np.testing.assert_array_equal(ours_c, ref_c)

    ours_o = np.asarray(morphology.open_(jnp.asarray(mask), fp))
    ref_o = cv2.morphologyEx(u8, cv2.MORPH_OPEN, cvk) > 0
    np.testing.assert_array_equal(ours_o, ref_o)


def test_rect_close_open_anisotropic(rng):
    # temperature stripe post-processing kernels (3x31 close, 3x7 open)
    mask = (rng.random((80, 80)) > 0.5)
    u8 = mask.astype(np.uint8) * 255
    fp = morphology.rect_kernel(31, 3)
    cvk = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 31))
    ours = np.asarray(morphology.close(jnp.asarray(mask), fp))
    ref = cv2.morphologyEx(u8, cv2.MORPH_CLOSE, cvk) > 0
    np.testing.assert_array_equal(ours, ref)


def test_dilate_iterations(rng):
    mask = (rng.random((40, 40)) > 0.85)
    u8 = mask.astype(np.uint8) * 255
    fp = morphology.ellipse_kernel(5, 5)
    cvk = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    ours = np.asarray(morphology.dilate(jnp.asarray(mask), fp, iterations=2))
    ref = cv2.dilate(u8, cvk, iterations=2) > 0
    np.testing.assert_array_equal(ours, ref)

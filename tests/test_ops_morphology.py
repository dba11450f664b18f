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


def _reconstruct_oracle(seed, mask):
    """Union of the 8-connected components of ``mask`` containing a seed."""
    import scipy.ndimage as ndi
    labels, n = ndi.label(mask, structure=np.ones((3, 3)))
    hit = np.unique(labels[seed & mask])
    hit = hit[hit > 0]
    return np.isin(labels, hit) & mask


def _both_routes(fn):
    """Run ``fn`` under each reconstruct body (dilation rounds and
    associative-scan sweeps) — the size gate picks between them in
    production, but both must share the exact fixed point."""
    old = morphology._SWEEP_MIN_PX
    for min_px in (old, 0):
        morphology._SWEEP_MIN_PX = min_px
        try:
            fn()
        finally:
            morphology._SWEEP_MIN_PX = old


def test_reconstruct_matches_components_oracle():
    def run():
        rng = np.random.default_rng(7)
        for density in (0.35, 0.55, 0.75):
            mask = rng.random((120, 140)) < density
            seed = mask & (rng.random((120, 140)) < 0.01)
            out = np.asarray(morphology.reconstruct(jnp.asarray(seed),
                                                    jnp.asarray(mask)))
            np.testing.assert_array_equal(out, _reconstruct_oracle(seed, mask))
    _both_routes(run)


def test_reconstruct_diagonal_corner_links():
    # two solid squares touching ONLY at a corner pixel: 8-connectivity must
    # cross it (the axis sweeps alone cannot; the in-round dilate must)
    def run():
        mask = np.zeros((40, 40), bool)
        mask[5:15, 5:15] = True
        mask[15:25, 15:25] = True
        seed = np.zeros_like(mask)
        seed[7, 7] = True
        out = np.asarray(morphology.reconstruct(jnp.asarray(seed),
                                                jnp.asarray(mask)))
        np.testing.assert_array_equal(out, mask)
    _both_routes(run)


def test_reconstruct_spiral_worst_case():
    # a 1-px spiral corridor: every round only advances the frontier a
    # bounded amount, so this exercises many while_loop rounds and the
    # exact fixed-point guarantee
    _both_routes(_spiral_case)


def _spiral_case():
    h = w = 41
    mask = np.zeros((h, w), bool)
    y0, y1, x0, x1 = 0, h - 1, 0, w - 1
    while y0 <= y1 and x0 <= x1:
        mask[y0, x0:x1 + 1] = True
        mask[y0:y1 + 1, x1] = True
        mask[y1, x0:x1 + 1] = True
        mask[y0 + 2:y1 + 1, x0] = True
        y0 += 2; x0 += 2; y1 -= 2; x1 -= 2
    # break it into one long connected corridor + leave a detached blob
    mask[1, 0] = False
    mask[35:38, 18:21] = False
    detached = np.zeros_like(mask)
    detached[36, 19] = True
    mask |= detached
    seed = np.zeros_like(mask)
    seed[0, 0] = True
    out = np.asarray(morphology.reconstruct(jnp.asarray(seed),
                                            jnp.asarray(mask)))
    np.testing.assert_array_equal(out, _reconstruct_oracle(seed, mask))
    assert not out[36, 19]


def test_hmax_ladder_equals_reduce_window():
    """The doubling shift-max ladder must be EXACTLY reduce_window (max/min
    are associative + idempotent, so overlapping spans are value-exact) for
    every window geometry the footprints produce, including asymmetric and
    one-sided windows at both borders."""
    import jax.lax as lax
    import jax.numpy as jnp
    from vistaf_tpu.ops.morphology import _NEG, _POS, _hmax
    rng = np.random.default_rng(7)
    x = rng.random((16, 41)).astype(np.float32)
    for init, op in [(_NEG, lax.max), (_POS, lax.min)]:
        for c0, c1 in [(-2, 2), (-1, 1), (0, 0), (-3, 1), (0, 4),
                       (-15, 15), (-5, 9), (-31, 0), (2, 6), (-6, -2)]:
            ref = lax.reduce_window(
                jnp.asarray(x), init, op,
                window_dimensions=(1, c1 - c0 + 1), window_strides=(1, 1),
                padding=((0, 0), (-c0, c1)))
            got = _hmax(jnp.asarray(x), c0, c1, init)
            np.testing.assert_array_equal(np.asarray(ref), np.asarray(got),
                                          err_msg=f"{init} {(c0, c1)}")

import numpy as np
import cv2
import jax.numpy as jnp

from vistaf_tpu.ops import warp


def test_warp_affine_inverse_map_matches_cv2(rng):
    img = (rng.random((60, 70)) * 255).astype(np.float32)
    th = 0.03
    M = np.array([[np.cos(th), -np.sin(th), 2.3],
                  [np.sin(th), np.cos(th), -1.7]], np.float32)
    ours = np.asarray(warp.warp_affine_inverse_map(jnp.asarray(img), jnp.asarray(M)))
    ref = cv2.warpAffine(img, M, (70, 60),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REFLECT)
    np.testing.assert_allclose(ours, ref, atol=0.75)  # cv2 fixed-point interp
    interior = np.abs(ours[5:-5, 5:-5] - ref[5:-5, 5:-5])
    assert interior.mean() < 0.05


def test_warp_affine_forward_matches_cv2(rng):
    img = (rng.random((40, 50)) * 255).astype(np.float32)
    M = np.array([[1.0, 0.0, 3.25], [0.0, 1.0, -2.5]], np.float32)
    ours = np.asarray(warp.warp_affine_forward(jnp.asarray(img), jnp.asarray(M)))
    ref = cv2.warpAffine(img, M, (50, 40), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_REFLECT)
    np.testing.assert_allclose(ours, ref, atol=0.75)


def test_translate_bilinear_matches_cv2(rng):
    img = (rng.random((60, 70)) * 255).astype(np.float32)
    for dx, dy in [(3.25, -2.5), (-7.8, 4.1), (0.0, 0.0)]:
        M = np.array([[1, 0, dx], [0, 1, dy]], np.float32)
        ref = cv2.warpAffine(img, M, (70, 60), flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_REFLECT)
        ours = np.asarray(warp.translate_bilinear(jnp.asarray(img), dx, dy, max_shift=16))
        np.testing.assert_allclose(ours, ref, atol=0.75)
        assert np.abs(ours[5:-5, 5:-5] - ref[5:-5, 5:-5]).mean() < 0.05


def test_rotation_matrix_matches_cv2():
    ours = np.asarray(warp.rotation_matrix((35.0, 20.0), 17.0))
    ref = cv2.getRotationMatrix2D((35.0, 20.0), 17.0, 1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_invert_affine():
    M = np.array([[0.9, -0.1, 5.0], [0.1, 0.9, -3.0]], np.float32)
    Minv = np.asarray(warp.invert_affine(jnp.asarray(M)))
    M3 = np.vstack([M, [0, 0, 1]])
    ref = np.linalg.inv(M3)[:2]
    np.testing.assert_allclose(Minv, ref, rtol=1e-5, atol=1e-5)


def test_shear_warp_stack_matches_gather_sampling(rng):
    """The gather-free two-pass shear warp must agree with true bilinear
    sampling for small euclidean warps (the ECC refinement regime)."""
    img = cv2.GaussianBlur(rng.random((90, 110)).astype(np.float32), (0, 0), 3)
    gx = np.gradient(img, axis=1).astype(np.float32)
    mask = np.zeros((90, 110), np.float32)
    mask[8:-8, 8:-8] = 1.0
    th, tx, ty = 0.008, 1.3, -0.7
    c, s = np.cos(th), np.sin(th)
    M = np.array([[c, -s, tx], [s, c, ty]], np.float32)

    S_cf = jnp.asarray(np.stack([img, gx, mask], axis=0))
    ours = np.asarray(warp.shear_warp_stack(S_cf, jnp.asarray(M), K=4))

    yy, xx = np.mgrid[0:90, 0:110].astype(np.float32)
    sx = c * xx - s * yy + tx
    sy = s * xx + c * yy + ty
    S_cl = jnp.asarray(np.stack([img, gx, mask], axis=-1))
    gold = np.asarray(warp.sample_bilinear_stack(
        S_cl, jnp.asarray(sy), jnp.asarray(sx)))
    gold = np.moveaxis(gold, -1, 0)

    # interior agreement (borders differ by constant0 band width)
    err = np.abs(ours[:, 6:-6, 6:-6] - gold[:, 6:-6, 6:-6])
    assert err.max() < 5e-3


def test_line_shift_frac_matches_roll(rng):
    """Per-row horizontal fractional shift: integer shifts equal exact
    zero-fill shifts; fractional shifts equal the 2-tap blend."""
    H, W = 40, 50
    x = rng.random((H, W, 2)).astype(np.float32)
    s_int = rng.integers(-9, 9, size=H).astype(np.float32)
    out = np.asarray(warp.line_shift_frac(jnp.asarray(x), jnp.asarray(s_int),
                                          shift_axis=1, line_axis=0, bits=5))
    # out[i, j] = x[i, j - s[i]] with zero border
    gold = np.zeros_like(x)
    for i in range(H):
        k = int(s_int[i])
        for j in range(W):
            if 0 <= j - k < W:
                gold[i, j] = x[i, j - k]
    np.testing.assert_allclose(out, gold, atol=1e-6)

    s_frac = s_int + 0.25
    out2 = np.asarray(warp.line_shift_frac(jnp.asarray(x), jnp.asarray(s_frac),
                                           shift_axis=1, line_axis=0, bits=5))
    gold2 = np.zeros_like(x)
    for i in range(H):
        k = int(s_int[i])
        for j in range(W):
            va = x[i, j - k] if 0 <= j - k < W else 0.0
            vb = x[i, j - k - 1] if 0 <= j - k - 1 < W else 0.0
            gold2[i, j] = 0.75 * va + 0.25 * vb
    np.testing.assert_allclose(out2, gold2, atol=1e-6)


def test_rotate_stack_shear_matches_gather_rotation(rng):
    """Paeth 3-shear rotation must agree with bilinear-gather sampling
    through rotation_matrix on smooth fields (the oriented-blur regime)."""
    h, w = 120, 160
    img = cv2.GaussianBlur(rng.random((h, w)).astype(np.float32), (0, 0), 4)
    roi = np.zeros((h, w), np.float32)
    cv2.circle(roi, (80, 60), 42, 1.0, -1)
    stack = jnp.asarray(np.stack([img, roi], axis=-1))
    center = (w / 2.0, h / 2.0)

    for ang in (-37.0, -5.0, 11.5, 44.0):
        ours = np.asarray(warp.rotate_stack_shear(stack, ang, center))
        M = warp.rotation_matrix(center, ang)
        Minv = warp.invert_affine(M)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        sx = np.asarray(Minv)[0, 0] * xx + np.asarray(Minv)[0, 1] * yy + np.asarray(Minv)[0, 2]
        sy = np.asarray(Minv)[1, 0] * xx + np.asarray(Minv)[1, 1] * yy + np.asarray(Minv)[1, 2]
        gold = np.asarray(warp.sample_bilinear_stack(stack, jnp.asarray(sy),
                                                     jnp.asarray(sx)))
        inside = gold[..., 1] > 0.9   # compare where the ROI survived
        err = np.abs(ours[..., 0] - gold[..., 0])[inside]
        assert err.max() < 0.02, (ang, err.max())
        # validity channel agrees except on the shear staircase fringe
        disagree = np.mean((ours[..., 1] > 0.5) != (gold[..., 1] > 0.5))
        assert disagree < 0.02, ang

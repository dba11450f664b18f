import numpy as np
import cv2
import jax.numpy as jnp

from vistaf_tpu.ops import filters


def test_gaussian_kernel_matches_cv2():
    for sigma in [1.5, 2.5, 6.0, 45.0]:
        ours = filters.gaussian_kernel1d(sigma)
        ksize = len(ours)
        ref = cv2.getGaussianKernel(ksize, sigma).ravel()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_gaussian_blur_matches_cv2(rng):
    img = rng.random((64, 80)).astype(np.float32) * 255
    for sigma in [1.5, 6.0]:
        ours = np.asarray(filters.gaussian_blur(jnp.asarray(img), sigma))
        ref = cv2.GaussianBlur(img, (0, 0), sigma)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-2)


def test_gaussian_blur_anisotropic(rng):
    img = rng.random((50, 60)).astype(np.float32)
    ours = np.asarray(filters.gaussian_blur(jnp.asarray(img), 6.0, 1.0))
    ref = cv2.GaussianBlur(img, (0, 0), sigmaX=6.0, sigmaY=1.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_box_filter_matches_cv2(rng):
    img = rng.random((40, 52)).astype(np.float32)
    ours = np.asarray(filters.box_filter(jnp.asarray(img), 11, normalize=False))
    ref = cv2.boxFilter(img, ddepth=-1, ksize=(11, 11), normalize=False)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_sobel_matches_cv2(rng):
    img = (rng.random((40, 52)) * 255).astype(np.float32)
    gx = np.asarray(filters.sobel(jnp.asarray(img), 1, 0))
    gy = np.asarray(filters.sobel(jnp.asarray(img), 0, 1))
    ref_gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3)
    ref_gy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3)
    # interior must match exactly; borders differ only by cv2's border handling
    np.testing.assert_allclose(gx[1:-1, 1:-1], ref_gx[1:-1, 1:-1], atol=1e-3)
    np.testing.assert_allclose(gy[1:-1, 1:-1], ref_gy[1:-1, 1:-1], atol=1e-3)


def test_masked_gaussian_smooth_formula(rng):
    z = rng.random((32, 32)).astype(np.float32)
    mask = rng.random((32, 32)) > 0.3
    ours = np.asarray(filters.masked_gaussian_smooth(jnp.asarray(z), jnp.asarray(mask), 2.5))
    z0 = z.copy()
    z0[~mask] = 0.0
    num = cv2.GaussianBlur(z0, (0, 0), 2.5)
    den = cv2.GaussianBlur(mask.astype(np.float32), (0, 0), 2.5) + 1e-6
    ref = num / den
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_hanning_window_matches_cv2():
    ours = filters.hanning_window(48, 64)
    ref = cv2.createHanningWindow((64, 48), cv2.CV_32F)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ifft2_sparse_patch_matches_dense():
    """The twiddle-matmul inverse transform must equal the dense
    ifft2(ifftshift(padded patch)) path exactly (same DFT, by linearity)."""
    import jax.numpy as jnp
    from vistaf_tpu.ops import fftops
    rng = np.random.default_rng(3)
    hf, wf, psz = 100, 120, 21
    patch = (rng.normal(size=(psz, psz)) + 1j * rng.normal(size=(psz, psz))).astype(np.complex64)
    row0, col0 = hf // 2 - psz // 2, wf // 2 - psz // 2
    dense = np.zeros((hf, wf), np.complex64)
    dense[row0:row0 + psz, col0:col0 + psz] = patch
    gold = np.fft.ifft2(np.fft.ifftshift(dense))
    ours = np.asarray(fftops.ifft2_sparse_patch(jnp.asarray(patch), hf, wf, row0, col0))
    np.testing.assert_allclose(ours, gold, atol=2e-6 * np.abs(patch).max())


def test_vpu_route_matches_banded_and_cv2(rng):
    """The two association orders (banded MXU matmul vs VPU shift-add) must
    both match cv2 within oracle tolerance AND each other tightly — the
    residual re-association dust is what moved a 4K golden by 1pp through
    its knife-edge thresholds (docs/PERF.md, conv-order incident), which is
    why ``vpu`` is an explicit opt-in rather than a silent routing."""
    img = rng.random((64, 80)).astype(np.float32) * 255
    for sigma in [1.5, 2.5, 6.0]:
        banded = np.asarray(filters.gaussian_blur(jnp.asarray(img), sigma))
        vpu = np.asarray(filters.gaussian_blur(jnp.asarray(img), sigma,
                                               vpu=True))
        ref = cv2.GaussianBlur(img, (0, 0), sigma)
        np.testing.assert_allclose(banded, ref, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(vpu, ref, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(vpu, banded, rtol=0, atol=2e-3)
    # above the tap cap the vpu request falls back to the banded matmul
    big_b = np.asarray(filters.gaussian_blur(jnp.asarray(img), 45.0))
    big_v = np.asarray(filters.gaussian_blur(jnp.asarray(img), 45.0, vpu=True))
    np.testing.assert_array_equal(big_v, big_b)

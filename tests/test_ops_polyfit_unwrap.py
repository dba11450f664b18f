import numpy as np
import jax.numpy as jnp

from vistaf_tpu.ops import polyfit, unwrap


def _numpy_robust_polyfit2d(z, mask, order=2, iters=6, c=4.685):
    """Independent NumPy oracle of the IRLS masked polyfit (same math as
    shape_ftp.py:1100-1136, re-derived)."""
    h, w = z.shape
    m = mask & np.isfinite(z)
    yy, xx = np.indices((h, w))
    x = xx[m].astype(np.float64)
    y = yy[m].astype(np.float64)
    zz = z[m].astype(np.float64)
    xn = (x - (w - 1) / 2.0) / ((w - 1) / 2.0)
    yn = (y - (h - 1) / 2.0) / ((h - 1) / 2.0)
    cols = [xn, yn, np.ones_like(xn)]
    if order >= 2:
        cols += [xn * xn, xn * yn, yn * yn]
    A = np.stack(cols, axis=1)
    wts = np.ones_like(zz)
    for _ in range(iters):
        Aw = A * wts[:, None]
        coef, *_ = np.linalg.lstsq(Aw, zz * wts, rcond=None)
        r = zz - A @ coef
        med = np.median(r)
        mad = np.median(np.abs(r - med)) + 1e-6
        u = r / (c * 1.4826 * mad)
        wts = 1.0 / (1.0 + u * u)
    return coef


def test_robust_polyfit_matches_oracle(rng):
    h, w = 60, 70
    yy, xx = np.indices((h, w))
    xn = (xx - (w - 1) / 2) / ((w - 1) / 2)
    yn = (yy - (h - 1) / 2) / ((h - 1) / 2)
    z = (1.2 * xn - 0.7 * yn + 0.3 + 0.5 * xn * xn).astype(np.float32)
    z += rng.normal(scale=0.01, size=z.shape).astype(np.float32)
    # outliers
    z[10:14, 10:14] += 5.0
    mask = np.ones((h, w), dtype=bool)
    mask[:5] = False

    coef, fit = polyfit.robust_polyfit2d(jnp.asarray(z), jnp.asarray(mask), order=2)
    ref_coef = _numpy_robust_polyfit2d(z, mask, order=2)
    np.testing.assert_allclose(np.asarray(coef), ref_coef, atol=5e-3)


def test_polyfit_degenerate_mask_returns_zero():
    z = np.ones((32, 32), np.float32)
    mask = np.zeros((32, 32), dtype=bool)
    mask[0, :5] = True
    coef, fit = polyfit.robust_polyfit2d(jnp.asarray(z), jnp.asarray(mask), order=2)
    assert np.allclose(np.asarray(coef), 0.0)


def test_unwrap_recovers_smooth_phase(rng):
    h, w = 96, 96
    yy, xx = np.indices((h, w))
    truth = (12.0 * np.exp(-(((xx - 48) ** 2 + (yy - 48) ** 2) / (2 * 18.0 ** 2)))
             + 0.02 * xx + 0.01 * yy).astype(np.float32)
    wrapped = np.angle(np.exp(1j * truth)).astype(np.float32)
    mask = (xx - 48) ** 2 + (yy - 48) ** 2 <= 44 ** 2

    out = np.asarray(unwrap.unwrap_wls(jnp.asarray(wrapped), jnp.asarray(mask), cg_iters=60))
    diff = out[mask] - truth[mask]
    diff -= diff.mean()
    # recovered up to a constant within small residual
    assert np.abs(diff).max() < 0.15, np.abs(diff).max()


def test_unwrap_identity_when_no_wraps(rng):
    h, w = 64, 64
    phase = rng.normal(scale=0.2, size=(h, w)).astype(np.float32)
    import cv2
    phase = cv2.GaussianBlur(phase, (0, 0), 5) * 3
    assert np.abs(phase).max() < np.pi
    mask = np.ones((h, w), dtype=bool)
    out = np.asarray(unwrap.unwrap_wls(jnp.asarray(phase), jnp.asarray(mask), cg_iters=60))
    diff = out - phase
    diff -= diff.mean()
    assert np.abs(diff).max() < 0.02


def test_poisson_dct_fft_route_matches_matmul():
    """Above _DCT_FFT_MIN_PX the preconditioner uses the FFT-based DCT;
    it must match the dense-matmul transform (same solve to ~1e-5)."""
    import numpy as np
    import jax.numpy as jnp
    from vistaf_tpu.ops import unwrap as U

    rng = np.random.default_rng(0)
    rho = rng.standard_normal((540, 700)).astype(np.float32)
    fft_out = np.asarray(U._poisson_dct_solve(jnp.asarray(rho)))
    old = U._DCT_FFT_MIN_PX
    try:
        U._DCT_FFT_MIN_PX = 10 ** 9          # force the matmul route
        mm_out = np.asarray(U._poisson_dct_solve(jnp.asarray(rho)))
    finally:
        U._DCT_FFT_MIN_PX = old
    scale = np.abs(mm_out).max() + 1e-9
    assert np.abs(fft_out - mm_out).max() / scale < 1e-4


def test_unwrap_downsample_congruent_matches_fullres(rng):
    """downsample=2 (coarse-grid PCG + full-res congruence projection) must
    agree with the full-res solve on a realistic smooth phase field: both
    outputs live on the lattice wrapped + 2*pi*k, so any disagreement is an
    exact 2*pi multiple, and on a smooth field the integer offsets match
    everywhere but (at most) isolated dust pixels."""
    h, w = 512, 512
    yy, xx = np.indices((h, w))
    truth = (14.0 * np.exp(-(((xx - 256) ** 2 + (yy - 256) ** 2)
                             / (2 * 90.0 ** 2)))
             + 0.015 * xx + 0.008 * yy).astype(np.float32)
    truth += rng.normal(scale=0.03, size=truth.shape).astype(np.float32)
    wrapped = np.angle(np.exp(1j * truth)).astype(np.float32)
    mask = (xx - 256) ** 2 + (yy - 256) ** 2 <= 236 ** 2

    full = np.asarray(unwrap.unwrap_wls(jnp.asarray(wrapped),
                                        jnp.asarray(mask), cg_iters=40))
    ds = np.asarray(unwrap.unwrap_wls(jnp.asarray(wrapped),
                                      jnp.asarray(mask), cg_iters=40,
                                      downsample=2))
    d = (ds - full)[mask]
    # congruence: every difference is an exact 2*pi integer multiple
    k = d / (2 * np.pi)
    np.testing.assert_allclose(k, np.round(k), atol=1e-3)
    # and the integer offsets agree on (essentially) every pixel
    frac_flipped = float(np.mean(np.abs(k) > 0.5))
    assert frac_flipped < 1e-3, frac_flipped
    # both recover the truth up to a constant
    diff = ds[mask] - truth[mask]
    diff -= diff.mean()
    assert np.abs(diff).max() < 0.5, np.abs(diff).max()


def test_unwrap_downsample_odd_shape(rng):
    """Non-divisible shapes are padded with zero-weight pixels; the result
    must stay finite inside the mask and NaN outside."""
    h, w = 97, 131
    yy, xx = np.indices((h, w))
    truth = (6.0 * np.exp(-(((xx - 65) ** 2 + (yy - 48) ** 2)
                            / (2 * 25.0 ** 2)))).astype(np.float32)
    wrapped = np.angle(np.exp(1j * truth)).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[4:-4, 6:-6] = True
    out = np.asarray(unwrap.unwrap_wls(jnp.asarray(wrapped),
                                       jnp.asarray(mask), cg_iters=40,
                                       downsample=2))
    assert np.all(np.isfinite(out[mask]))
    assert np.all(~np.isfinite(out[~mask]))
    d = (out[mask] - wrapped[mask]) / (2 * np.pi)
    np.testing.assert_allclose(d, np.round(d), atol=1e-3)

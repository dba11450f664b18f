import os

import numpy as np
import cv2
import jax.numpy as jnp
import pytest

from vistaf_tpu.ops import registration, filters


def _textured(rng, h=128, w=160):
    img = rng.random((h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3) * 255
    return img.astype(np.float32)


def test_phase_correlate_matches_cv2(rng):
    a = _textured(rng, 256, 320)
    shift = (4.3, -2.6)
    M = np.array([[1, 0, shift[0]], [0, 1, shift[1]]], np.float32)
    b = cv2.warpAffine(a, M, (a.shape[1], a.shape[0]), borderMode=cv2.BORDER_REFLECT)

    hann = cv2.createHanningWindow((a.shape[1], a.shape[0]), cv2.CV_32F)
    ref_shift, ref_resp = cv2.phaseCorrelate(a, b, hann)
    dx, dy, resp = registration.phase_correlate(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(hann))
    # we must recover the applied shift accurately (the synthetic warp's
    # reflect border biases estimators at the ~0.2 px level)
    assert abs(float(dx) - shift[0]) < 0.3
    assert abs(float(dy) - shift[1]) < 0.3
    # cv2's estimator is fragile on weak textures; only compare when its own
    # response says it locked on
    if ref_resp > 0.1:
        assert abs(float(dx) - ref_shift[0]) < 0.5
        assert abs(float(dy) - ref_shift[1]) < 0.5


def test_ecc_euclidean_recovers_warp(rng):
    ref = _textured(rng, 120, 120)
    th = 0.02
    true_M = np.array([[np.cos(th), -np.sin(th), 1.5],
                       [np.sin(th), np.cos(th), -2.0]], np.float32)
    # moving image = ref sampled at W(x): mov(x) = ref? build mov so that
    # sampling mov at W(x) recovers ref: mov = warp of ref with inverse map of
    # inverse warp -> just generate mov by warping ref forward with true_M.
    mov = cv2.warpAffine(ref, true_M, (120, 120),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REFLECT)
    # now mov(x) = ref(W x) => template=mov, image=ref gives warp ~ true_M
    mask = np.ones((120, 120), dtype=bool)

    warp, rho, it = registration.ecc_align(
        jnp.asarray(mov), jnp.asarray(ref), jnp.asarray(mask),
        mode="euclidean", max_iters=200, eps=1e-7)
    warp = np.asarray(warp)
    assert float(rho) > 0.99
    # we recover the true warp essentially exactly
    np.testing.assert_allclose(warp, true_M, atol=0.01)

    # cv2's ECC (with its internal blur and early rho-based stop) lands in
    # the same neighborhood
    cv_warp = np.eye(2, 3, dtype=np.float32)
    cc, cv_warp = cv2.findTransformECC(
        mov, ref, cv_warp, cv2.MOTION_EUCLIDEAN,
        (cv2.TERM_CRITERIA_EPS | cv2.TERM_CRITERIA_COUNT, 200, 1e-7))
    np.testing.assert_allclose(warp, cv_warp, atol=0.1)


def test_ecc_align_and_warp_translation(rng):
    ref = _textured(rng, 100, 100)
    M = np.array([[1, 0, 3.0], [0, 1, 1.5]], np.float32)
    mov = cv2.warpAffine(ref, M, (100, 100),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REFLECT)
    mask = np.zeros((100, 100), dtype=bool)
    mask[10:90, 10:90] = True
    aligned, warp, rho = registration.ecc_align_and_warp(
        jnp.asarray(ref), jnp.asarray(mov), jnp.asarray(mask),
        mode="translation", max_iters=100, eps=1e-6, gauss_filt=3.0)
    # aligned should match ref in the interior
    a = np.asarray(aligned)
    err = np.abs(a[20:80, 20:80] - ref[20:80, 20:80])
    assert err.mean() < 2.0


def test_ecc_align_shear_sampler_matches_gather(rng):
    """sampler='shear' must converge to the same warp as the gather path."""
    ref = _textured(rng, 120, 140)
    th, tx, ty = 0.006, 1.1, -0.8
    c, s = np.cos(th), np.sin(th)
    true_M = np.array([[c, -s, tx], [s, c, ty]], np.float32)
    mov = cv2.warpAffine(ref, true_M, (140, 120),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REFLECT)
    mask = np.zeros((120, 140), dtype=bool)
    mask[10:-10, 10:-10] = True
    r = filters.gaussian_blur(jnp.asarray(ref / 255.0), 3.0)
    m = filters.gaussian_blur(jnp.asarray(mov / 255.0), 3.0)
    wg, rho_g, _ = registration.ecc_align(m, r, jnp.asarray(mask),
                                          mode="euclidean", max_iters=200)
    ws, rho_s, _ = registration.ecc_align(m, r, jnp.asarray(mask),
                                          mode="euclidean", max_iters=200,
                                          sampler="shear", shear_k=4)
    np.testing.assert_allclose(np.asarray(ws), np.asarray(wg), atol=0.02)
    np.testing.assert_allclose(np.asarray(ws), true_M, atol=0.03)
    assert float(rho_s) > 0.99


def test_ecc_stall_patience_preserves_convergent_result(rng):
    """The divergence early-out must be a no-op whenever the GN loop
    converges normally (it only fires in the oscillating regime)."""
    ref = _textured(rng, 120, 120)
    th = 0.015
    true_M = np.array([[np.cos(th), -np.sin(th), 1.0],
                       [np.sin(th), np.cos(th), -1.5]], np.float32)
    mov = cv2.warpAffine(ref, true_M, (120, 120),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REFLECT)
    mask = np.ones((120, 120), dtype=bool)
    args = (jnp.asarray(mov), jnp.asarray(ref), jnp.asarray(mask))
    w0, rho0, it0 = registration.ecc_align(*args, mode="euclidean",
                                           max_iters=200, eps=1e-7)
    w1, rho1, it1 = registration.ecc_align(*args, mode="euclidean",
                                           max_iters=200, eps=1e-7,
                                           stall_patience=25)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), atol=1e-6)
    assert abs(float(rho0) - float(rho1)) < 1e-6
    assert int(it1) <= int(it0)


def test_ecc_stall_patience_bounds_nonconvergent_iters(rng):
    """Pure-noise template/image: rho wanders without converging; the
    patience rule must bound the iteration count well below max_iters while
    returning the best-rho iterate."""
    a = rng.normal(size=(96, 96)).astype(np.float32)
    b = rng.normal(size=(96, 96)).astype(np.float32)
    mask = np.ones((96, 96), dtype=bool)
    w, rho, it = registration.ecc_align(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask),
        mode="euclidean", max_iters=300, eps=0.0, stall_patience=20)
    # eps=0 disables the convergence stop entirely, so only failure or the
    # patience rule can end the loop early
    assert int(it) < 300
    assert np.all(np.isfinite(np.asarray(w))) or np.isnan(float(rho))


_GSD_TPU_SMOKE = """
import numpy as np, jax, jax.numpy as jnp
from vistaf_tpu.ops.registration import phase_correlate
from vistaf_tpu.ops.filters import gaussian_blur, hanning_window

H, W = 1080, 1920
rng = np.random.default_rng(3)
base = rng.normal(scale=40.0, size=(H, W))
base = np.asarray(gaussian_blur(jnp.asarray(base, jnp.float32), 3.0)).copy()
base += 128.0
win = jnp.asarray(hanning_window(H, W))
winp = jnp.asarray(hanning_window(H // 2, W // 2))
# fractional shift via Fourier phase ramp (the realistic case; integer
# shifts are exactly recovered and hide the centroid bias)
sy, sx = 4.3, -6.7
fy = np.fft.fftfreq(H)[:, None]
fx = np.fft.fftfreq(W)[None, :]
sh = np.real(np.fft.ifft2(np.fft.fft2(base)
                          * np.exp(-2j * np.pi * (fy * sy + fx * sx))))
a = np.clip(base, 0, 255).astype(np.uint8)
b = np.clip(sh + rng.normal(scale=1.0, size=(H, W)), 0, 255).astype(np.uint8)
ab = jnp.stack([jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)])
blur = jax.vmap(lambda g: gaussian_blur(g, 7.0))(ab)
dx, dy, _ = phase_correlate(blur[0], blur[1], win)
pooled = blur.reshape(2, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
dxp, dyp, _ = phase_correlate(pooled[0], pooled[1], winp)
assert abs(float(dy) - sy) < 0.5 and abs(float(dx) - sx) < 0.5, (dy, dx)
assert abs(float(dyp) * 2 - float(dy)) < 0.75, (dyp, dy)
assert abs(float(dxp) * 2 - float(dx)) < 0.75, (dxp, dx)
print("TPU_GSD_OK", float(dx), float(dy), float(dxp) * 2, float(dyp) * 2)
"""


@pytest.mark.skipif(os.environ.get("VISTAF_RUN_TPU") != "1",
                    reason="real-TPU smoke (set VISTAF_RUN_TPU=1)")
def test_phase_correlate_pooling_invariance_sigma7_tpu():
    """Ops-level pin of the deploy claim ON THE REAL CHIP: on sigma-7
    blurred frames (the global-shift pre-blur regime at native 4K), phase
    correlation on a 2x2-average-pooled frame with the shift scaled back
    lands within the sub-pixel centroid's own error band of the full-res
    estimate (<0.75 px; worst case is a half-integer pooled shift).  The
    residual is absorbed by the ECC refinement that always follows.

    TPU-gated because sigma-7 leaves so little coherent spectrum that the
    f32 ``P/|P|`` normalization is roundoff-dominated on the CPU backend's
    FFT — the claim is a property of the production backend."""
    import subprocess
    import sys
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-c", _GSD_TPU_SMOKE],
                         env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TPU_GSD_OK" in out.stdout


def test_global_shift_downsample_matches_fullres():
    """global_shift_downsample=2 (phase correlation on a 2x2-pooled frame,
    shift scaled back) must land on the same global shift as the full-frame
    estimate to within the sub-pixel centroid band, with the shift scaled
    back correctly and the min_px gate honored."""
    import numpy as np
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W = 480, 640
    cfg = scaled_ftp_config(H, W)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, cfg)
    # The pure carrier grating is degenerate for phase correlation (every
    # integer-period shift is equivalent); real frames carry aperiodic scene
    # texture.  Add a shared low-frequency random field to both frames so a
    # correlation peak exists, then roll the deformed frame.  The roll is
    # EVEN so the true shift is integral at pooled resolution — the
    # half-integer centroid-bias band (<0.75 px) is pinned separately on
    # the real chip by test_phase_correlate_pooling_invariance_sigma7_tpu.
    rng = np.random.default_rng(7)
    tex = np.kron(rng.normal(scale=18.0, size=(H // 16, W // 16)),
                  np.ones((16, 16)))[:, :, None]
    ref = np.clip(ref.astype(np.float64) + tex, 0, 255).astype(np.uint8)
    de = np.clip(de.astype(np.float64) + tex, 0, 255).astype(np.uint8)
    de = np.roll(de, shift=(4, -2), axis=(0, 1))  # inject a global shift

    base = FTPPipeline(cfg, p2h, debug_outputs=True)(ref, de)
    ds = FTPPipeline(cfg.replace(global_shift_downsample=2,
                                 global_shift_downsample_min_px=64),
                     p2h, debug_outputs=True)(ref, de)

    sb = np.asarray(base["dbg_global_shift"])
    sd = np.asarray(ds["dbg_global_shift"])
    assert np.hypot(sb[0], sb[1]) > 1.0      # the injected shift was seen
    assert abs(sb[0] - sd[0]) < 0.15 and abs(sb[1] - sd[1]) < 0.15
    # End-to-end sanity only: this synthetic fixture's heightmap moves
    # ~0.7% per 0.05 px of sub-pixel resample phase (measured; the
    # deformation signal is at the resampling-dust scale), so a tight
    # volume bound here would measure the fixture, not the knob.  Output
    # parity for the deploy preset is held by the 4K goldens suite.
    hb, hd = base["height_map_mm_crop"], ds["height_map_mm_crop"]
    both = np.isfinite(hb) & np.isfinite(hd)
    vb = float(np.sum(np.where(both, np.maximum(hb, 0), 0)))
    vd = float(np.sum(np.where(both, np.maximum(hd, 0), 0)))
    assert abs(vd - vb) / max(abs(vb), 1e-9) < 2e-2
    # min_px gate: deploy-default gating leaves small frames on the
    # full-res path (identical estimates)
    gated = FTPPipeline(cfg.replace(global_shift_downsample=2),
                        p2h, debug_outputs=True)(ref, de)
    sg = np.asarray(gated["dbg_global_shift"])
    np.testing.assert_allclose(sg, sb, atol=1e-6)


def test_ecc_downsample_matches_fullres():
    """ecc_downsample=2 (half-res warp estimation, translations scaled
    back) must land on the same warp as full-res estimation — alignment is
    low-frequency on the sigma-blurred crops."""
    import numpy as np
    import jax.numpy as jnp
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W = 480, 640
    cfg = scaled_ftp_config(H, W)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, cfg)

    base = FTPPipeline(cfg, p2h, debug_outputs=True)(ref, de)
    ds = FTPPipeline(cfg.replace(ecc_downsample=2, ecc_downsample_min_px=64),
                     p2h, debug_outputs=True)(ref, de)

    wb, wd = np.asarray(base["dbg_ecc_warp"]), np.asarray(ds["dbg_ecc_warp"])
    assert abs(wb[0, 2] - wd[0, 2]) < 0.15 and abs(wb[1, 2] - wd[1, 2]) < 0.15
    # rotation part
    np.testing.assert_allclose(wb[:, :2], wd[:, :2], atol=2e-4)
    # end-to-end heightmap within the accuracy contract
    hb, hd = base["height_map_mm_crop"], ds["height_map_mm_crop"]
    both = np.isfinite(hb) & np.isfinite(hd)
    vb = float(np.sum(np.where(both, np.maximum(hb, 0), 0)))
    vd = float(np.sum(np.where(both, np.maximum(hd, 0), 0)))
    assert abs(vd - vb) / max(abs(vb), 1e-9) < 2e-3


def test_global_shift_window_matches_fullres():
    """global_shift_window_px (full-resolution phase correlation on a
    window around the ROI) must land on the same global shift as the
    full-frame estimate — the shift is rigid, so any textured window sees
    it — and the size gate must keep too-small frames on the full path."""
    import numpy as np
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W = 480, 640
    cfg = scaled_ftp_config(H, W)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, cfg)
    rng = np.random.default_rng(11)
    tex = np.kron(rng.normal(scale=18.0, size=(H // 16, W // 16)),
                  np.ones((16, 16)))[:, :, None]
    ref = np.clip(ref.astype(np.float64) + tex, 0, 255).astype(np.uint8)
    de = np.clip(de.astype(np.float64) + tex, 0, 255).astype(np.uint8)
    de = np.roll(de, shift=(4, -2), axis=(0, 1))

    base = FTPPipeline(cfg, p2h, debug_outputs=True)(ref, de)
    win = FTPPipeline(cfg.replace(global_shift_window_px=256),
                      p2h, debug_outputs=True)(ref, de)

    sb = np.asarray(base["dbg_global_shift"])
    sw = np.asarray(win["dbg_global_shift"])
    assert np.hypot(sb[0], sb[1]) > 1.0
    assert abs(sb[0] - sw[0]) < 0.2 and abs(sb[1] - sw[1]) < 0.2
    # frames smaller than window + 2*margin stay on the full-frame path
    gated = FTPPipeline(cfg.replace(global_shift_window_px=2048),
                        p2h, debug_outputs=True)(ref, de)
    sg = np.asarray(gated["dbg_global_shift"])
    np.testing.assert_allclose(sg, sb, atol=1e-6)


def test_ecc_align_p_init_seeds_the_solve(rng):
    """A near-true seed converges to the true warp, and in fewer GN
    iterations than the identity start needs."""
    ref = _textured(rng, 120, 120)
    th = 0.05
    true_M = np.array([[np.cos(th), -np.sin(th), 4.5],
                       [np.sin(th), np.cos(th), -5.0]], np.float32)
    mov = cv2.warpAffine(ref, true_M, (120, 120),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
                         borderMode=cv2.BORDER_REFLECT)
    mask = np.ones((120, 120), dtype=bool)

    seed = jnp.asarray([th, 4.5, -5.0], jnp.float32)
    warp_s, rho_s, it_s = registration.ecc_align(
        jnp.asarray(mov), jnp.asarray(ref), jnp.asarray(mask),
        mode="euclidean", max_iters=100, eps=1e-7, p_init=seed)
    np.testing.assert_allclose(np.asarray(warp_s), true_M, atol=0.02)
    assert float(rho_s) > 0.99

    warp_i, _, it_i = registration.ecc_align(
        jnp.asarray(mov), jnp.asarray(ref), jnp.asarray(mask),
        mode="euclidean", max_iters=100, eps=1e-7)
    np.testing.assert_allclose(np.asarray(warp_i), true_M, atol=0.02)
    assert int(it_s) < int(it_i)


def test_ecc_coarse_to_fine_matches_plain_downsample():
    """ecc_polish_iters (coarse ds=4 descent + short polish on the ds grid)
    must land on the same warp as the plain ds-grid solve."""
    import numpy as np
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W = 480, 640
    cfg = scaled_ftp_config(H, W)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, cfg)

    plain = FTPPipeline(cfg.replace(ecc_downsample=2, ecc_downsample_min_px=64),
                        p2h, debug_outputs=True)(ref, de)
    c2f = FTPPipeline(cfg.replace(ecc_downsample=2, ecc_downsample_min_px=64,
                                  ecc_polish_iters=10),
                      p2h, debug_outputs=True)(ref, de)

    wp = np.asarray(plain["dbg_ecc_warp"])
    wc = np.asarray(c2f["dbg_ecc_warp"])
    assert abs(wp[0, 2] - wc[0, 2]) < 0.15 and abs(wp[1, 2] - wc[1, 2]) < 0.15
    np.testing.assert_allclose(wp[:, :2], wc[:, :2], atol=2e-4)
    hb, hd = plain["height_map_mm_crop"], c2f["height_map_mm_crop"]
    both = np.isfinite(hb) & np.isfinite(hd)
    vb = float(np.sum(np.where(both, np.maximum(hb, 0), 0)))
    vd = float(np.sum(np.where(both, np.maximum(hd, 0), 0)))
    assert abs(vd - vb) / max(abs(vb), 1e-9) < 2e-3

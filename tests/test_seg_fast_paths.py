"""Deploy-preset segmentation fast paths vs their reference-faithful twins.

Three independently gated substitutions (config.py TempConfig knobs):
- seg_peak_method='cascade': filter cascade as fused masked argmaxes
  (ops/fftops.py::carrier_peak_cascade) vs top-k + choose_carrier_peak.
- seg_bandpass='matmul': windowed two-matmul IDFT around the dynamic carrier
  (ops/fftops.py::ifft2_bandpass_dynamic) vs full-frame masked ifft2 — the
  same math, so only f32-rounding-level differences are allowed.
- compute_bbox: post-FFT per-pixel stages cropped to the ROI bbox — exact by
  masking, so outputs must be bit-identical.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vistaf_tpu.config import TempConfig
from vistaf_tpu.ops import fftops
from vistaf_tpu.temperature.segmentation import segment_stripes

H, W = 192, 320


def _stripe_scene(seed=0, angle_deg=8.0, period_px=9.0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    th = np.deg2rad(angle_deg)
    carrier = (np.cos(th) * xx + np.sin(th) * yy) / period_px
    gray = np.clip(120 + 55 * np.sin(2 * np.pi * carrier)
                   + 12 * np.sin(2 * np.pi * yy / H)        # illumination
                   + rng.normal(0, 3, (H, W)), 0, 255).astype(np.float32)
    cy, cx = H // 2, W // 2
    roi = ((yy - cy) ** 2 + (xx - cx) ** 2) < (0.42 * H) ** 2
    return gray, roi


def _cfg(**kw):
    return TempConfig().replace(
        seg_dc_exclusion=4, seg_band_radius=6.0, seg_illum_sigma=6.0,
        sat_dilate_ksize=5, post_close_ky=9, post_open_ky=3,
        percentile_method="hist", **kw)


@pytest.mark.parametrize("angle_deg", [0.0, 8.0, -25.0, 80.0])
def test_cascade_peak_matches_topk(angle_deg):
    gray, roi = _stripe_scene(angle_deg=angle_deg)
    i = jnp.asarray(gray / gray.mean())
    Fs = jnp.fft.fftshift(jnp.fft.fft2(i))
    mag = jnp.abs(Fs)
    xs, ys, vs = fftops.find_top_peaks(mag, 4, 16)
    px0, py0 = fftops.choose_carrier_peak(xs, ys, vs, H, W, True, True, 0.14)
    px1, py1 = fftops.carrier_peak_cascade(mag, 4, True, True, 0.14)
    assert (int(px0), int(py0)) == (int(px1), int(py1))


def test_ifft2_bandpass_dynamic_matches_dense():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (H, W)).astype(np.float32)
    Fs = jnp.fft.fftshift(jnp.fft.fft2(jnp.asarray(x)))
    for (px, py) in [(W // 2 + 40, H // 2 + 9),
                     (W - 3, H // 2),          # window clipped at the border
                     (W // 2 + 7, 4)]:
        r = 6.0
        yy, xx = np.mgrid[:H, :W]
        bp = jnp.asarray((xx - px) ** 2 + (yy - py) ** 2 <= r ** 2)
        z_ref = jnp.fft.ifft2(jnp.fft.ifftshift(jnp.where(bp, Fs, 0)))
        z_new = fftops.ifft2_bandpass_dynamic(Fs, jnp.int32(px), jnp.int32(py), r)
        scale = float(jnp.max(jnp.abs(z_ref))) + 1e-30
        err = float(jnp.max(jnp.abs(z_ref - z_new))) / scale
        assert err < 5e-4, (px, py, err)


def test_ifft2_bandpass_dynamic_window_slices():
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (H, W)).astype(np.float32)
    Fs = jnp.fft.fftshift(jnp.fft.fft2(jnp.asarray(x)))
    px, py, r = W // 2 + 23, H // 2 - 11, 5.0
    full = fftops.ifft2_bandpass_dynamic(Fs, jnp.int32(px), jnp.int32(py), r)
    rows, cols = slice(32, 160), slice(64, 256)
    win = fftops.ifft2_bandpass_dynamic(Fs, jnp.int32(px), jnp.int32(py), r,
                                        rows=rows, cols=cols)
    np.testing.assert_allclose(np.asarray(win), np.asarray(full)[rows, cols],
                               rtol=0, atol=1e-5)


def test_segment_matmul_bandpass_matches_fft():
    gray, roi = _stripe_scene()
    s0 = segment_stripes(jnp.asarray(gray), jnp.asarray(roi), _cfg())
    s1 = segment_stripes(jnp.asarray(gray), jnp.asarray(roi),
                         _cfg(seg_bandpass="matmul", seg_peak_method="cascade"))
    assert np.array_equal(np.asarray(s0.peak_xy), np.asarray(s1.peak_xy))
    # same math in different f32 orders: only sign-boundary pixels may flip
    for a, b, name in [(s0.dark, s1.dark, "dark"), (s0.light, s1.light, "light")]:
        frac = float(jnp.mean(a != b))
        assert frac < 5e-3, (name, frac)
    assert float(jnp.abs(s0.angle_rad - s1.angle_rad)) < 1e-6
    assert float(jnp.abs(s0.period_px - s1.period_px)) < 1e-6


@pytest.mark.parametrize("bandpass", ["fft", "matmul"])
def test_segment_compute_bbox_exact(bandpass):
    gray, roi = _stripe_scene()
    cfg = _cfg(seg_bandpass=bandpass,
               seg_peak_method="cascade" if bandpass == "matmul" else "topk")
    # bbox containing the ROI circle with ample pad (circle r ~= 81 at center)
    y0, y1 = 0, H
    x0, x1 = 32, 288
    assert not roi[:, :x0].any() and not roi[:, x1:].any()
    s_full = segment_stripes(jnp.asarray(gray), jnp.asarray(roi), cfg)
    s_crop = segment_stripes(jnp.asarray(gray), jnp.asarray(roi), cfg,
                             compute_bbox=(y0, y1, x0, x1))
    # roi_eff has no z dependence -> bit-identical
    assert np.array_equal(np.asarray(s_full.roi_eff), np.asarray(s_crop.roi_eff))
    # dark/light depend on phi0, a full- vs crop-shaped f32 reduction ->
    # only sign-boundary pixels may flip
    for a, b, name in [(s_full.dark, s_crop.dark, "dark"),
                       (s_full.light, s_crop.light, "light")]:
        assert a.shape == b.shape == (H, W), name
        frac = float(jnp.mean(a != b))
        assert frac < 5e-3, (name, frac)
    # nothing outside the bbox
    d = np.asarray(s_crop.dark)
    assert not d[:, :x0].any() and not d[:, x1:].any()


def test_cascade_vs_topk_divergent_case_pinned():
    """The documented semantic divergence (ops/fftops.py cascade docstring):
    a plane whose preferred region (right half, near-row) holds NO global
    top-16 peak but is non-empty in the full plane.  There the reference's
    top-k + filter falls back to the unfiltered global peak (left half),
    while the cascade picks the preferred region's strongest bin.  This
    pins BOTH behaviors so the divergence stays a documented choice, not an
    accident — and asserts which preset takes which path."""
    h, w = 128, 128
    cy, cx = h // 2, w // 2
    dc = 10
    mag = np.full((h, w), 1e-3, np.float32)
    # 20 strong peaks, all in the LEFT half-plane AND off the near-center
    # rows (so both reference filters come up empty within the top-16 and
    # its fallback is the unfiltered global argmax), outside the DC notch
    off_row = np.concatenate([np.arange(8, cy - 20), np.arange(cy + 21, h - 8)])
    rng = np.random.default_rng(3)
    ys = rng.choice(off_row, size=20, replace=False)
    for i, y in enumerate(ys):
        mag[y, 12 + (i % 8) * 4] = 100.0 - i
    # one weak peak in the preferred region (right half, near center row)
    mag[cy + 3, cx + 20] = 5.0
    m = jnp.asarray(mag)

    # reference-faithful top-k path: right-half filter is empty within the
    # top-16, so it falls back and returns the global (left-half) peak
    xs, ys_, mags = fftops.find_top_peaks(m, dc, 16)
    px_t, py_t = fftops.choose_carrier_peak(xs, ys_, mags, h, w)
    assert int(px_t) < cx, "top-k fallback should pick the left-half peak"
    assert float(mag[int(py_t), int(px_t)]) == 100.0

    # cascade: the preferred region is non-empty in the FULL plane, so it
    # picks that region's strongest bin
    px_c, py_c = fftops.carrier_peak_cascade(m, dc)
    assert (int(px_c), int(py_c)) == (cx + 20, cy + 3)

    # presets: parity keeps the reference-faithful top-k, deploy the cascade
    from vistaf_tpu.config import FTPConfig
    assert FTPConfig().peak_method == "topk"
    assert FTPConfig().deploy().peak_method == "cascade"
    assert TempConfig().seg_peak_method == "topk"
    assert TempConfig().deploy().seg_peak_method == "cascade"


def test_cascade_vs_topk_agree_when_preferred_region_has_topk_peak():
    """On any spectrum whose preferred region holds at least one global
    top-16 peak (every physical stripe/grating frame), the two methods pick
    the identical bin."""
    h, w = 128, 128
    cy, cx = h // 2, w // 2
    dc = 10
    mag = np.full((h, w), 1e-3, np.float32)
    mag[cy - 2, cx - 18] = 90.0          # conjugate (left) peak, stronger
    mag[cy + 2, cx + 18] = 80.0          # carrier in the preferred region
    mag[cy + 40, cx + 30] = 85.0         # off-row right-half distractor
    m = jnp.asarray(mag)

    xs, ys_, mags = fftops.find_top_peaks(m, dc, 16)
    px_t, py_t = fftops.choose_carrier_peak(xs, ys_, mags, h, w)
    px_c, py_c = fftops.carrier_peak_cascade(m, dc)
    assert (int(px_t), int(py_t)) == (int(px_c), int(py_c)) == (cx + 18, cy + 2)


def test_cascade_half_matches_full_plane():
    """carrier_peak_cascade_half over the row-shifted rfft2 half-spectrum
    must pick the same bin as the full-plane cascade with
    force_right_half_plane=True."""
    for angle in (0.0, 8.0, -25.0, 80.0):
        gray, roi = _stripe_scene(angle_deg=angle)
        i = jnp.asarray(gray / gray.mean())
        mag = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(i)))
        px0, py0 = fftops.carrier_peak_cascade(mag, 4, True, True, 0.14)
        Rr = jnp.roll(jnp.fft.rfft2(i), H // 2, axis=0)
        k, py1 = fftops.carrier_peak_cascade_half(jnp.abs(Rr), 4, True, 0.14)
        assert (int(px0), int(py0)) == (int(k) + W // 2, int(py1)), angle


def test_ifft2_bandpass_half_matches_full():
    """The half-spectrum windowed IDFT must equal the full-spectrum one for
    every carrier position, including low-frequency carriers whose window
    reaches Hermitian-mirrored negative-kx columns."""
    rng = np.random.default_rng(3)
    x = rng.normal(0, 1, (H, W)).astype(np.float32)
    xd = jnp.asarray(x)
    Fs = jnp.fft.fftshift(jnp.fft.fft2(xd))
    Rr = jnp.roll(jnp.fft.rfft2(xd), H // 2, axis=0)
    r = 6.0
    for (px, py) in [(W // 2 + 40, H // 2 + 9),
                     (W // 2 + 3, H // 2 + 5),   # window crosses kx=0
                     (W // 2 + 7, 4)]:           # clipped at top row
        zf = fftops.ifft2_bandpass_dynamic(Fs, jnp.int32(px), jnp.int32(py), r)
        zh = fftops.ifft2_bandpass_dynamic_half(
            Rr, jnp.int32(px - W // 2), jnp.int32(py), r)
        scale = float(jnp.max(jnp.abs(zf))) + 1e-12
        err = float(jnp.max(jnp.abs(zf - zh))) / scale
        assert err < 2e-5, (px, py, err)


def test_segment_rfft_matches_fft2_path():
    """Full segment_stripes: the deploy rfft2 forward must reproduce the
    fft2 path's masks/angle/period up to boundary-pixel dust."""
    gray, roi = _stripe_scene(angle_deg=8.0)
    base = _cfg(seg_peak_method="cascade", seg_bandpass="matmul",
                seg_force_right_half_plane=True)
    a = segment_stripes(jnp.asarray(gray), jnp.asarray(roi), base)
    b = segment_stripes(jnp.asarray(gray), jnp.asarray(roi),
                        base.replace(seg_fft="rfft2"))
    assert int(a.peak_xy[0]) == int(b.peak_xy[0])
    assert int(a.peak_xy[1]) == int(b.peak_xy[1])
    np.testing.assert_allclose(float(a.angle_rad), float(b.angle_rad))
    np.testing.assert_allclose(float(a.period_px), float(b.period_px))
    for name in ("dark", "light", "sat", "roi_eff"):
        ma, mb = np.asarray(getattr(a, name)), np.asarray(getattr(b, name))
        assert (ma != mb).mean() < 2e-3, name

"""FTP complex demodulation: preprocess -> FFT -> sideband isolation -> ifft.

TPU re-design of ``shape_ftp.ftp_complex_demod`` (``shape_ftp.py:810-1037``):

- glare repair: percentile-thresholded bad-pixel mask + diffusion inpaint
  (replaces cv2 Telea, ``shape_ftp.py:625-666``);
- illumination normalization I/blur(sigma=45) - 1, pre-blur sigma=1.5,
  circular apodization, masked-median DC removal;
- reflect pad, fft2, carrier selection (top-k + heuristics + parabolic log
  refinement) or carrier lock to the reference frame;
- patch-shift sideband isolation: Hann-windowed (2*bw+1)^2-bin patch moved to
  DC via dynamic_slice/dynamic_update_slice + fractional-bin phase ramp
  (``shape_ftp.py:929-964``), or truncated-Gaussian bandpass alternative
  (``shape_ftp.py:966-988``).

All shapes static; the data-dependent carrier position flows through
dynamic_slice starts only.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ops import fftops
from vistaf_tpu.ops.filters import gaussian_blur, gradient_magnitude, hann_patch
from vistaf_tpu.ops.inpaint import inpaint_diffusion
from vistaf_tpu.ops.morphology import dilate, ellipse_kernel
from vistaf_tpu.ops.percentile import get_percentile_fn


class DemodResult(NamedTuple):
    complex_demod: jnp.ndarray      # (h, w) complex64, carrier removed
    amp: jnp.ndarray                # (h, w) float32 |complex_demod|
    peak_f: jnp.ndarray             # (2,) float32 refined peak (x, y) in bins
    k: jnp.ndarray                  # (2,) float32 carrier offset from DC (kx, ky)
    fft_shape: Tuple[int, int]      # static (hf, wf)
    i_norm: jnp.ndarray             # (h, w) float32 normalized image (debug)


def _preprocess(gray: jnp.ndarray, apo: Optional[jnp.ndarray], cfg: FTPConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bad-pixel repair + illumination normalization + apodization.

    Returns (windowed image ready for FFT padding, I_norm)."""
    img = gray.astype(jnp.float32)
    valid = (apo > 1e-6) if apo is not None else jnp.ones_like(img, dtype=bool)

    if cfg.bad_pixel_enable:
        grad = gradient_magnitude(img)
        if cfg.percentile_method == "hist":
            # 64-bin ladder: bracket error range/64^3 ~ 1e-3 of the intensity
            # range, far below the tail-threshold noise floor, at half the
            # bandwidth of 128-bin passes (these are the widest counts in
            # the graph: (pair, 2, N, B))
            from vistaf_tpu.ops.percentile import masked_percentile_hist_rows
            thr = masked_percentile_hist_rows(
                jnp.stack([img.ravel(), grad.ravel()]),
                jnp.stack([valid.ravel(), valid.ravel()]),
                (cfg.bad_intensity_percentile, cfg.bad_gradient_percentile),
                bins=64)
            hi_thr, g_thr = thr[0], thr[1]
        else:
            pctl = get_percentile_fn(cfg.percentile_method)
            hi_thr = pctl(img, valid, cfg.bad_intensity_percentile)
            g_thr = pctl(grad, valid, cfg.bad_gradient_percentile)
        bad = ((img >= hi_thr) | (grad >= g_thr)) & valid
        if cfg.bad_dilate_ksize and cfg.bad_dilate_ksize > 1:
            ksz = max(3, cfg.bad_dilate_ksize | 1)
            bad = dilate(bad, ellipse_kernel(ksz, ksz), iterations=cfg.bad_dilate_iters)
        img = inpaint_diffusion(img, bad, iters=cfg.inpaint_iters)

    blur = gaussian_blur(img, cfg.illum_sigma_px, vpu=cfg.conv_vpu)
    i_norm = img / (blur + 1e-6) - 1.0

    if cfg.pre_blur_sigma_px and cfg.pre_blur_sigma_px > 0:
        i_norm = gaussian_blur(i_norm, cfg.pre_blur_sigma_px, vpu=cfg.conv_vpu)

    iw = i_norm
    if apo is not None:
        iw = iw * apo

    if cfg.remove_mean_after_apod:
        if cfg.dc_remove_stat == "mean":
            from vistaf_tpu.ops.percentile import masked_mean
            mu = masked_mean(iw, valid)
        else:
            pctl = get_percentile_fn(cfg.percentile_method)
            mu = pctl(iw, valid if apo is not None else None, 50.0)
        iw = iw - mu

    if cfg.use_hann_window:
        h0, w0 = iw.shape
        iw = iw * jnp.asarray(hann_patch(h0, w0))

    return iw, i_norm


def _search_carrier(fft_mag: jnp.ndarray, hf: int, wf: int, cfg: FTPConfig):
    """Integer carrier bin via the configured method (cfg.peak_method)."""
    if cfg.peak_method == "cascade":
        return fftops.carrier_peak_cascade(
            fft_mag, cfg.dc_exclusion,
            force_right_half_plane=cfg.force_right_half_plane,
            prefer_near_center_row=cfg.prefer_peak_near_center_row,
            peak_max_dy_frac=cfg.peak_max_dy_from_center)
    xs, ys, mags = fftops.find_top_peaks(fft_mag, cfg.dc_exclusion, cfg.n_fft_peaks)
    return fftops.choose_carrier_peak(
        xs, ys, mags, hf, wf,
        force_right_half_plane=cfg.force_right_half_plane,
        prefer_near_center_row=cfg.prefer_peak_near_center_row,
        peak_max_dy_frac=cfg.peak_max_dy_from_center)


def ftp_complex_demod(gray: jnp.ndarray, apo: Optional[jnp.ndarray], cfg: FTPConfig,
                      carrier_refined: Optional[jnp.ndarray] = None) -> DemodResult:
    """Demodulate one frame.  With ``carrier_refined`` given, the carrier is
    locked to that (x, y) float bin position (LOCK_CARRIER_TO_REFERENCE,
    ``shape_ftp.py:891-894``); otherwise it is searched and refined."""
    h, w = gray.shape
    iw, i_norm = _preprocess(gray, apo, cfg)

    pad = int(max(0, cfg.fft_pad_px))
    iw_fft = fftops.reflect_pad(iw, pad) if pad > 0 else iw
    hf, wf = iw_fft.shape
    cy, cx = hf // 2, wf // 2

    F_shift, fft_mag = fftops.fft2_shifted_mag(iw_fft)

    if carrier_refined is None:
        px, py = _search_carrier(fft_mag, hf, wf, cfg)
        fx, fy = fftops.refine_peak_parabolic_log(fft_mag, px, py)
        peak_f = jnp.stack([fx, fy])
    else:
        peak_f = carrier_refined.astype(jnp.float32)

    px_i = jnp.round(peak_f[0]).astype(jnp.int32)
    py_i = jnp.round(peak_f[1]).astype(jnp.int32)

    if cfg.sideband_method == "patch_shift":
        bw = int(max(3, cfg.patch_half_width_bins))
        psz = 2 * bw + 1
        patch = jax.lax.dynamic_slice(F_shift, (py_i - bw, px_i - bw), (psz, psz))
        if cfg.patch_window == "hann":
            patch = patch * jnp.asarray(hann_patch(psz, psz))
        complex_field = fftops.ifft2_sparse_patch(
            patch, hf, wf, cy - psz // 2, cx - psz // 2)
        dpx = peak_f[0] - px_i.astype(jnp.float32)
        dpy = peak_f[1] - py_i.astype(jnp.float32)
        complex_field = complex_field * fftops.frac_ramp(hf, wf, dpx, dpy, sign=-1.0)
        complex_demod_full = complex_field
    else:
        yy = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 1)
        dist2_peak = (xx - peak_f[0]) ** 2 + (yy - peak_f[1]) ** 2
        dist2_dc = (xx - cx) ** 2 + (yy - cy) ** 2
        sigma = max(1e-6, float(cfg.band_radius))
        gauss = jnp.exp(-0.5 * dist2_peak / (sigma * sigma))
        rcut = max(3.0, float(cfg.gauss_trunc_radius))
        gauss = gauss * (dist2_peak <= rcut * rcut)
        gauss = jnp.where(dist2_dc <= float(cfg.dc_exclusion) ** 2, 0.0, gauss)
        complex_field = jnp.fft.ifft2(jnp.fft.ifftshift(F_shift * gauss))
        kx = peak_f[0] - cx
        ky = peak_f[1] - cy
        complex_demod_full = complex_field * fftops.frac_ramp(hf, wf, kx, ky, sign=-1.0)

    if pad > 0:
        complex_demod = complex_demod_full[pad:pad + h, pad:pad + w]
    else:
        complex_demod = complex_demod_full

    amp = jnp.abs(complex_demod).astype(jnp.float32)
    k = jnp.stack([peak_f[0] - cx, peak_f[1] - cy])
    return DemodResult(complex_demod, amp, peak_f, k, (hf, wf), i_norm)


def _demod_pair_rfft(iw_pair: jnp.ndarray, i_norm_pair: jnp.ndarray,
                     iw_fft: jnp.ndarray, h: int, w: int, cfg: FTPConfig
                     ) -> Tuple[DemodResult, DemodResult]:
    """Half-spectrum demod-pair tail (see ``ftp_complex_demod_pair``).

    Works in the row-shifted rfft layout: ``Rr[r, k] == F_shift[r, cx + k]``
    for kx = k in [0, cx].  The carrier search / parabolic refinement read
    the half-plane magnitude; the sideband patch is sliced from the
    half-spectrum extended with ``bw`` Hermitian-mirrored negative-kx
    columns, so every bin equals its full-``fft2`` counterpart up to
    rfft-vs-fft rounding dust.
    """
    _, hf, wf = iw_fft.shape
    cy, cx = hf // 2, wf // 2
    pad = int(max(0, cfg.fft_pad_px))
    bw = int(max(3, cfg.patch_half_width_bins))
    psz = 2 * bw + 1

    R = jnp.fft.rfft2(iw_fft, axes=(-2, -1))
    Rr = jnp.roll(R, cy, axis=-2)                    # rows -> shifted layout
    mag_half = jnp.abs(Rr[0])                        # (hf, cx + 1)

    # cascade over the half-plane (force_right_half_plane is a precondition)
    dc = int(cfg.dc_exclusion)
    iy = jax.lax.broadcasted_iota(jnp.int32, mag_half.shape, 0)
    ik = jax.lax.broadcasted_iota(jnp.int32, mag_half.shape, 1)
    notch = (ik < dc) & (iy >= cy - dc) & (iy < cy + dc)
    m1 = (~notch) & (ik >= 1)                        # x > cx in full coords
    if cfg.prefer_peak_near_center_row is not None and cfg.prefer_peak_near_center_row:
        max_dy = jnp.int32(int(cfg.peak_max_dy_from_center * hf))
        m2 = m1 & (jnp.abs(iy - cy) <= max_dy)
    else:
        m2 = m1
    neg = jnp.float32(-3.0e38)
    i2 = jnp.argmax(jnp.where(m2, mag_half, neg))
    i1 = jnp.argmax(jnp.where(m1, mag_half, neg))
    idx = jnp.where(jnp.any(m2), i2, i1)
    kw = mag_half.shape[1]
    k_i0 = (idx % kw).astype(jnp.int32)
    py0 = (idx // kw).astype(jnp.int32)

    fx_h, fy = fftops.refine_peak_parabolic_log(mag_half, k_i0, py0)
    peak_f = jnp.stack([fx_h + jnp.float32(cx), fy])
    px_i = jnp.round(peak_f[0]).astype(jnp.int32)
    py_i = jnp.round(peak_f[1]).astype(jnp.int32)
    k_i = px_i - cx

    # Hermitian extension: bw negative-kx columns so a low-frequency
    # carrier's patch stays inside the slice
    mirror = jnp.conj(jnp.roll(jnp.flip(Rr, axis=-2), 1, axis=-2))
    ext_left = mirror[:, :, 1:bw + 1][..., ::-1]
    E = jnp.concatenate([ext_left, Rr], axis=-1)     # cols <-> kx in [-bw, cx]

    patch = jax.lax.dynamic_slice(E, (0, py_i - bw, k_i), (2, psz, psz))
    if cfg.patch_window == "hann":
        patch = patch * jnp.asarray(hann_patch(psz, psz))[None]
    field = fftops.ifft2_sparse_patch(patch, hf, wf, cy - psz // 2, cx - psz // 2)
    dpx = peak_f[0] - px_i.astype(jnp.float32)
    dpy = peak_f[1] - py_i.astype(jnp.float32)
    field = field * fftops.frac_ramp(hf, wf, dpx, dpy, sign=-1.0)[None]

    if pad > 0:
        field = field[:, pad:pad + h, pad:pad + w]
    amp = jnp.abs(field).astype(jnp.float32)
    k = jnp.stack([peak_f[0] - cx, peak_f[1] - cy])
    dref = DemodResult(field[0], amp[0], peak_f, k, (hf, wf), i_norm_pair[0])
    ddef = DemodResult(field[1], amp[1], peak_f, k, (hf, wf), i_norm_pair[1])
    return dref, ddef


def ftp_complex_demod_pair(gray_ref: jnp.ndarray, gray_def: jnp.ndarray,
                           apo: Optional[jnp.ndarray], cfg: FTPConfig
                           ) -> Tuple[DemodResult, DemodResult]:
    """Demodulate a reference/deformed pair with the carrier locked to the
    reference peak (LOCK_CARRIER_TO_REFERENCE, ``shape_ftp.py:1641-1653``),
    batching every frame-independent stage over a leading pair axis: the
    preprocessing, FFTs, patch shift and inverse FFTs each run once on a
    (2, h, w) stack instead of twice (the pipeline is launch-bound on TPU;
    this halves the demod kernel count).  Only the carrier search reads the
    reference spectrum.  Numerics are identical to two sequential
    ``ftp_complex_demod`` calls with a locked carrier.

    When the carrier search is constrained to the right half-plane and the
    sideband method is patch_shift (both reference defaults), the forward
    transform runs as an ``rfft2`` on the real pair — the input is real, so
    the right half-plane IS the full information content and the few
    negative-kx patch columns a low-frequency carrier could touch are
    reconstructed from Hermitian symmetry (F(-k) = conj(F(k))).  Identical
    bins, half the forward-FFT work, and no full-plane fftshift copies.
    """
    h, w = gray_ref.shape
    stack = jnp.stack([gray_ref, gray_def], axis=0)

    iw_pair, i_norm_pair = jax.vmap(lambda g: _preprocess(g, apo, cfg))(stack)

    pad = int(max(0, cfg.fft_pad_px))
    if pad > 0:
        iw_fft = jnp.pad(iw_pair, ((0, 0), (pad, pad), (pad, pad)), mode="symmetric")
    else:
        iw_fft = iw_pair
    _, hf, wf = iw_fft.shape
    cy, cx = hf // 2, wf // 2

    if (cfg.sideband_method == "patch_shift" and cfg.force_right_half_plane
            and cfg.peak_method == "cascade" and hf % 2 == 0 and wf % 2 == 0
            and min(hf, wf) >= cfg.demod_rfft_min_px):
        return _demod_pair_rfft(iw_pair, i_norm_pair, iw_fft, h, w, cfg)

    F = jnp.fft.fft2(iw_fft, axes=(-2, -1))
    F_shift = jnp.fft.fftshift(F, axes=(-2, -1))
    ref_mag = jnp.abs(F_shift[0])

    px, py = _search_carrier(ref_mag, hf, wf, cfg)
    fx, fy = fftops.refine_peak_parabolic_log(ref_mag, px, py)
    peak_f = jnp.stack([fx, fy])

    px_i = jnp.round(peak_f[0]).astype(jnp.int32)
    py_i = jnp.round(peak_f[1]).astype(jnp.int32)

    if cfg.sideband_method == "patch_shift":
        bw = int(max(3, cfg.patch_half_width_bins))
        psz = 2 * bw + 1
        patch = jax.lax.dynamic_slice(F_shift, (0, py_i - bw, px_i - bw), (2, psz, psz))
        if cfg.patch_window == "hann":
            patch = patch * jnp.asarray(hann_patch(psz, psz))[None]
        # The recentered spectrum is zero outside the (psz, psz) patch, so
        # the dense ifft2 collapses to two small twiddle matmuls (exact DFT
        # linearity): field = Ey @ patch @ Ex with Ey/Ex the inverse-DFT
        # columns for the patch's bin rows/cols after ifftshift.
        field = fftops.ifft2_sparse_patch(patch, hf, wf, cy - psz // 2, cx - psz // 2)
        dpx = peak_f[0] - px_i.astype(jnp.float32)
        dpy = peak_f[1] - py_i.astype(jnp.float32)
        field = field * fftops.frac_ramp(hf, wf, dpx, dpy, sign=-1.0)[None]
    else:
        yy = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (hf, wf), 1)
        dist2_peak = (xx - peak_f[0]) ** 2 + (yy - peak_f[1]) ** 2
        dist2_dc = (xx - cx) ** 2 + (yy - cy) ** 2
        sigma = max(1e-6, float(cfg.band_radius))
        gauss = jnp.exp(-0.5 * dist2_peak / (sigma * sigma))
        rcut = max(3.0, float(cfg.gauss_trunc_radius))
        gauss = gauss * (dist2_peak <= rcut * rcut)
        gauss = jnp.where(dist2_dc <= float(cfg.dc_exclusion) ** 2, 0.0, gauss)
        field = jnp.fft.ifft2(jnp.fft.ifftshift(F_shift * gauss[None], axes=(-2, -1)),
                              axes=(-2, -1))
        kx = peak_f[0] - cx
        ky = peak_f[1] - cy
        field = field * fftops.frac_ramp(hf, wf, kx, ky, sign=-1.0)[None]

    if pad > 0:
        field = field[:, pad:pad + h, pad:pad + w]
    amp = jnp.abs(field).astype(jnp.float32)
    k = jnp.stack([peak_f[0] - cx, peak_f[1] - cy])

    dref = DemodResult(field[0], amp[0], peak_f, k, (hf, wf), i_norm_pair[0])
    ddef = DemodResult(field[1], amp[1], peak_f, k, (hf, wf), i_norm_pair[1])
    return dref, ddef

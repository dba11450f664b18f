"""Temperature inference: frame -> fused per-pixel °C map + stats.

TPU counterpart of ``temperature_sensor.main`` (``temperature_sensor.py:749-960``):
feature planes (OpenCV-convention LAB + gray after 5x5 blur), FFT stripe
segmentation, WIDE model over the full effective ROI, COLOR model on the
chroma-gated colored-stripe support, per-domain inpainting, per-pixel fusion
with a blend band around the color model's upper validity bound, clamping and
stripe-oriented anisotropic smoothing — one jitted graph per frame.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vistaf_tpu.calib.temp_weights import TempModelWeights, load_reference_models
from vistaf_tpu.config import TempConfig
from vistaf_tpu.ops import geometry
from vistaf_tpu.ops.color import bgr_to_gray, bgr_to_lab_u8, chroma_ab
from vistaf_tpu.ops.filters import gaussian_blur, gaussian_blur_u8_round
from vistaf_tpu.ops.inpaint import inpaint_within_roi
from vistaf_tpu.ops.morphology import dilate, ellipse_kernel
from vistaf_tpu.ops.warp import rotation_matrix
from vistaf_tpu.temperature.segmentation import segment_stripes


def fuse_maps_per_pixel(roi, wide_map, color_map, cfg: TempConfig):
    """Per-pixel fusion (``temperature_sensor.py:594-635``): wide baseline,
    color overrides inside its validity band, linear blend near the top of
    the color range, final clamp."""
    final = wide_map
    wide_ok = roi & jnp.isfinite(wide_map)
    color_ok = (roi & jnp.isfinite(color_map)
                & (color_map >= cfg.color_t_min - cfg.color_guard_band)
                & (color_map <= cfg.color_t_max + cfg.color_guard_band))
    final = jnp.where(color_ok, color_map, final)
    source = jnp.where(color_ok, jnp.uint8(255), jnp.uint8(0))

    low_th = cfg.color_t_max - cfg.switch_margin_c
    high_th = cfg.color_t_max + cfg.switch_margin_c
    blend = wide_ok & color_ok & (wide_map > low_th) & (wide_map < high_th)
    wgt = jnp.clip((high_th - wide_map) / (high_th - low_th), 0.0, 1.0)
    final = jnp.where(blend, wgt * color_map + (1.0 - wgt) * wide_map, final)
    source = jnp.where(blend, jnp.uint8(128), source)

    final = clamp_map(final, roi, cfg.final_t_min, cfg.final_t_max)
    return final.astype(jnp.float32), source, color_ok


def clamp_map(m, roi, lo, hi):
    """(``temperature_sensor.py:538-543``): clip inside ROI, NaN outside."""
    out = jnp.where(roi & jnp.isfinite(m), jnp.clip(m, lo, hi), m)
    return jnp.where(roi, out, jnp.nan)


def _rotate_stack(stack, M):
    """Forward-warp an (H, W, C) stack by affine M with one shared gather
    (the map channel and its ROI-validity channel rotate together; the disk
    ROI keeps everything of interest far from the border, so the border-mode
    differences vs cv2 land only on pixels the ROI discards)."""
    from vistaf_tpu.ops.warp import invert_affine, sample_bilinear_stack
    h, w = stack.shape[:2]
    Minv = invert_affine(M)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = Minv[0, 0] * xx + Minv[0, 1] * yy + Minv[0, 2]
    sy = Minv[1, 0] * xx + Minv[1, 1] * yy + Minv[1, 2]
    return sample_bilinear_stack(stack, sy, sx)


def oriented_gaussian_blur(map_f, roi, angle_rad, sigma_across, sigma_along,
                           method: str = "gather", vpu: bool = False):
    """Rotate so across-stripe direction aligns with +x, anisotropic blur,
    rotate back (``temperature_sensor.py:705-742``).

    method 'gather' samples both rotations through full-frame bilinear
    gathers (closest to cv2.warpAffine; the parity default).  method
    'shear' runs the Paeth three-shear rotation (``rotate_stack_shear``)
    instead: TPU gathers over 8 M pixels dominated the native-4K
    temperature latency (~577 of ~690 ms, scripts/profile_temp4k.py), while
    the shear path is pure vectorized shift-selects.  Angles beyond the
    shear decomposition's 50° validity are folded by quarter turns — a 90°
    rotation is exactly an axis swap of the two blur sigmas, so the fold
    swaps (sigma_across, sigma_along) instead of resampling.
    """
    if sigma_across <= 0 and sigma_along <= 0:
        return jnp.where(roi, map_f, jnp.nan)
    h, w = map_f.shape
    center = (w / 2.0, h / 2.0)
    angle_deg = -angle_rad * 180.0 / jnp.pi
    sa = float(max(sigma_across, 1e-6))
    sl = float(max(sigma_along, 1e-6))

    map0 = jnp.where(jnp.isfinite(map_f), map_f, 0.0)
    stack0 = jnp.stack([map0, roi.astype(jnp.float32)], axis=-1)

    if method == "shear":
        from vistaf_tpu.ops.warp import rotate_stack_shear
        q = jnp.round(angle_deg / 90.0)
        ang = angle_deg - 90.0 * q
        odd = (jnp.abs(q.astype(jnp.int32)) % 2) == 1

        # the two fold branches share BOTH rotations and differ only in the
        # blur sigma pair — keep the rotations outside the cond so a vmapped
        # caller (cond lowers to select there) pays the shear passes once
        rot = rotate_stack_shear(stack0, ang, center)
        blurred = jax.lax.cond(
            odd,
            lambda m: gaussian_blur(m, sl, sa, vpu=vpu),
            lambda m: gaussian_blur(m, sa, sl, vpu=vpu),
            rot[..., 0])
        stack1 = jnp.stack([blurred, (rot[..., 1] > 0.5).astype(jnp.float32)],
                           axis=-1)
        back = rotate_stack_shear(stack1, -ang, center)
        return jnp.where(back[..., 1] > 0.5, back[..., 0], jnp.nan)

    M = rotation_matrix(center, angle_deg)
    rot = _rotate_stack(stack0, M)
    rot_map = rot[..., 0]
    rot_roi = rot[..., 1] > 0.5

    blurred = gaussian_blur(rot_map, sa, sl, vpu=vpu)

    M_inv = rotation_matrix(center, -angle_deg)
    back = _rotate_stack(jnp.stack([blurred, rot_roi.astype(jnp.float32)], axis=-1), M_inv)
    back_roi = back[..., 1] > 0.5
    return jnp.where(back_roi, back[..., 0], jnp.nan)


class TemperaturePipeline:
    """Host wrapper owning static ROI geometry + model weights.

    Usage::

        pipe = TemperaturePipeline(cfg, color_model, wide_model)
        out = pipe(frame_bgr_u8)
    """

    def __init__(self, cfg: TempConfig, color_model: TempModelWeights,
                 wide_model: TempModelWeights):
        self.cfg = cfg
        self.color_model = color_model
        self.wide_model = wide_model

        h, w = cfg.image_height, cfg.image_width
        outer = geometry.circle_from_3_points_exact(
            cfg.outer_circle_p1, cfg.outer_circle_p2, cfg.outer_circle_p3)
        self._roi_outer = geometry.circular_mask(h, w, *outer)
        if cfg.use_inner_circle:
            inner = geometry.circle_from_3_points_exact(
                cfg.inner_circle_p1, cfg.inner_circle_p2, cfg.inner_circle_p3)
            self._roi_full = geometry.annulus_mask(h, w, inner, outer)
        else:
            self._roi_full = self._roi_outer
        self._crop_bbox = (geometry.bbox_from_mask(self._roi_outer, pad=cfg.crop_pad_px)
                           if cfg.crop_output_to_outer_roi else None)
        # static compute bbox (cfg.crop_compute): per-pixel stages run on
        # this crop and re-embed; the pad covers every local-op reach —
        # diffusion inpainting propagates 1 px/iteration, and the Paeth
        # shear rotation's FIRST x-shear pass overshoots the rotated
        # position by up to R*(sec(angle/2)-1) <= ~0.1*R before later
        # passes bring rim pixels back inside (R grown by the <=128 px the
        # tile alignment can shift the crop center off the circle center);
        # edges aligned to TPU tiles
        if cfg.crop_compute:
            r_outer = float(outer[2])
            pad = max(64, cfg.wide_inpaint_iters + 8,
                      cfg.color_inpaint_iters + 8,
                      int(0.1 * (r_outer + 128.0)) + 8)
            y0, y1, x0, x1 = geometry.bbox_from_mask(self._roi_outer, pad=pad)
            self._compute_bbox = (max(0, (y0 // 8) * 8),
                                  min(h, -(-y1 // 8) * 8),
                                  max(0, (x0 // 128) * 128),
                                  min(w, -(-x1 // 128) * 128))
        else:
            self._compute_bbox = None
        self._fused_fn = None
        if cfg.use_fused_kernel and jax.default_backend() == "tpu":
            # off-TPU the Mosaic kernel cannot lower; the jnp path below is
            # the identical-numerics fallback (mirrors the quantile/inpaint/
            # ECC kernels' backend guards)
            from vistaf_tpu.pallas.temp_kernel import make_fused_temperature_fn
            self._fused_fn = make_fused_temperature_fn(cfg, color_model, wide_model)
        self._forward = jax.jit(self._forward_impl)
        self._stats_forward = None

    # ------------------------------------------------------------------
    def stats(self, frame_bgr: np.ndarray) -> Dict[str, Any]:
        """Scalar-only forward: same graph, but only the masked statistics
        tail (t_mean/min/max/std, valid_pixels, stripe angle/period) is
        fetched — the 8 full-frame map embeds are dead-coded away.  Values
        are identical to ``__call__``'s (the stats never read the embeds);
        evidence harnesses use this to avoid ~270 MB of map fetches per
        scene over the dev tunnel."""
        if self._stats_forward is None:
            def _stats_impl(frame):
                o = self._forward_impl(frame)
                return {k: o[k] for k in ("t_mean", "t_min", "t_max", "t_std",
                                          "valid_pixels", "stripe_angle_rad",
                                          "stripe_period_px")}
            self._stats_forward = jax.jit(_stats_impl)
        out = self._stats_forward(jnp.asarray(frame_bgr))
        return {k: np.asarray(v) for k, v in out.items()}

    # ------------------------------------------------------------------
    def __call__(self, frame_bgr: np.ndarray) -> Dict[str, Any]:
        out = self._forward(jnp.asarray(frame_bgr))
        res = {k: np.asarray(v) for k, v in out.items()}
        res["roi_full"] = np.asarray(self._roi_full)
        res["roi_outer"] = np.asarray(self._roi_outer)
        res["crop_bbox"] = self._crop_bbox
        return res

    @classmethod
    def from_artifacts(cls, data_root: str, cfg: Optional[TempConfig] = None) -> "TemperaturePipeline":
        cfg = cfg or TempConfig()
        color, wide = load_reference_models(data_root)
        return cls(cfg, color, wide)

    # ------------------------------------------------------------------
    def _forward_impl(self, frame_bgr: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        roi_full = jnp.asarray(self._roi_full)
        roi_outer = jnp.asarray(self._roi_outer)
        full_hw = frame_bgr.shape[:2]

        gray_raw = bgr_to_gray(frame_bgr)

        # --- segmentation on the unblurred frame (needs the full-frame FFT;
        # its post-FFT per-pixel stages run on the compute bbox when set)
        seg = segment_stripes(gray_raw, roi_full, cfg,
                              compute_bbox=self._compute_bbox)

        # --- from here on everything is per-pixel/local: optionally run it
        # on the static outer-ROI bbox (cfg.crop_compute) and re-embed
        cb = self._compute_bbox

        def crop(a):
            return a[cb[0]:cb[1], cb[2]:cb[3]] if cb is not None else a

        def embed(a, fill):
            if cb is None:
                return a
            full = jnp.full(full_hw + a.shape[2:], fill, a.dtype)
            return jax.lax.dynamic_update_slice(
                full, a, (cb[0], cb[2]) + (0,) * (a.ndim - 2))

        frame_c = crop(frame_bgr)
        roi_full_c = crop(roi_full)
        roi_eff_c = crop(seg.roi_eff)
        light_c = crop(seg.light)
        sat_c = crop(seg.sat)

        # --- feature planes from the 5x5-blurred frame (temperature_sensor.py:279-292)
        if cfg.blur_ksize > 1:
            ch = [gaussian_blur_u8_round(frame_c[..., i].astype(jnp.float32),
                                         cfg.blur_ksize, vpu=cfg.conv_vpu)
                  for i in range(3)]
            blurred = jnp.stack(ch, axis=-1)
        else:
            blurred = frame_c.astype(jnp.float32)

        light_d = dilate(light_c, ellipse_kernel(cfg.color_support_dilate | 1,
                                                 cfg.color_support_dilate | 1))
        csup_pre = light_d & roi_eff_c & ~sat_c

        if self._fused_fn is not None:
            # fused Pallas path: LAB + chroma + both models in one VMEM pass
            wide_map_raw, color_map_raw, color_support = self._fused_fn(
                blurred, roi_eff_c, csup_pre)
            chroma = None  # lives inside the fused kernel; not exported
        else:
            lab = bgr_to_lab_u8(blurred)
            L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
            gray = bgr_to_gray(blurred)
            chroma = chroma_ab(a, b)

            # --- color support (temperature_sensor.py:797-799)
            color_support = csup_pre & (chroma >= cfg.color_chroma_min)

            # --- model predictions
            feats_wide = jnp.stack([L, a, b, gray], axis=-1)
            wide_pred = self.wide_model.predict(feats_wide)
            wide_map_raw = jnp.where(roi_eff_c, wide_pred, jnp.nan)

            feats_color = jnp.stack([L, a, b], axis=-1)
            color_pred = self.color_model.predict(feats_color)
            color_map_raw = jnp.where(color_support, color_pred, jnp.nan)

        # --- per-domain inpainting + clamping (temperature_sensor.py:836-840)
        wide_map = inpaint_within_roi(wide_map_raw, roi_full_c, ~jnp.isfinite(wide_map_raw) & roi_full_c,
                                      iters=cfg.wide_inpaint_iters, quantize_u8=True)
        wide_map = clamp_map(wide_map, roi_full_c, cfg.final_t_min, cfg.final_t_max)

        color_map = inpaint_within_roi(color_map_raw, color_support,
                                       ~jnp.isfinite(color_map_raw) & color_support,
                                       iters=cfg.color_inpaint_iters, quantize_u8=True)
        color_map = clamp_map(color_map, color_support,
                              cfg.color_t_min - 5.0, cfg.color_t_max + 5.0)

        # --- fuse
        final_fused, source_map, color_ok = fuse_maps_per_pixel(roi_full_c, wide_map, color_map, cfg)

        # --- oriented smoothing (rotate-blur-rotate-back is independent of
        # the rotation center up to border effects, so the crop is safe)
        if cfg.final_smooth_enable:
            final_map = oriented_gaussian_blur(final_fused, roi_full_c, seg.angle_rad,
                                               cfg.final_smooth_sigma_across,
                                               cfg.final_smooth_sigma_along,
                                               method=cfg.rotate_method,
                                               vpu=cfg.conv_vpu)
            final_map = clamp_map(final_map, roi_full_c, cfg.final_t_min, cfg.final_t_max)
        else:
            final_map = final_fused

        stats_roi = crop(roi_outer if cfg.crop_output_to_outer_roi else roi_full)
        inside = stats_roi & jnp.isfinite(final_map)
        n = jnp.maximum(jnp.sum(inside.astype(jnp.float32)), 1.0)
        vals = jnp.where(inside, final_map, 0.0)
        t_mean = jnp.sum(vals) / n
        t_min = jnp.min(jnp.where(inside, final_map, jnp.inf))
        t_max = jnp.max(jnp.where(inside, final_map, -jnp.inf))
        t_std = jnp.sqrt(jnp.sum(jnp.where(inside, (final_map - t_mean) ** 2, 0.0)) / n)

        return {
            "temperature_map_fused": embed(final_fused, jnp.nan),
            "temperature_map_final": embed(final_map, jnp.nan),
            "wide_map": embed(wide_map, jnp.nan),
            "color_map": embed(color_map, jnp.nan),
            # pre-inpaint raw predictions for the reference's unconditional
            # debug_{wide,color}_raw_* artifact set (temperature_sensor.py:873-908)
            "wide_map_raw": embed(wide_map_raw, jnp.nan),
            "color_map_raw": embed(color_map_raw, jnp.nan),
            "source_map": embed(source_map, 0),
            **({"chroma": embed(chroma, 0.0)} if chroma is not None else {}),
            "mask_dark": seg.dark,
            "mask_light": seg.light,
            "mask_sat": seg.sat,
            "mask_roi_eff": seg.roi_eff,
            "mask_color_support": embed(color_support, False),
            "mask_color_ok": embed(color_ok, False),
            "stripe_angle_rad": seg.angle_rad,
            "stripe_period_px": seg.period_px,
            "seg_peak_xy": seg.peak_xy,
            "t_mean": t_mean,
            "t_min": t_min,
            "t_max": t_max,
            "t_std": t_std,
            "valid_pixels": jnp.sum(inside.astype(jnp.int32)),
        }

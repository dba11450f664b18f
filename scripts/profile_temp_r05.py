"""Round-5 attribution of the remaining ~22 ms temperature-4K deploy step.

Round 4 took the temperature deploy step 77.6 -> ~21 ms by fixing the
segmentation (masked median, TopK, full-frame ifft2, morphology); its
five-piece table accounts for ~10 ms.  This script attributes the OTHER
half at HEAD: feature blurs, the fused LAB+poly Pallas kernel, the two
domain inpaints, fusion, the oriented shear blur, and the full-frame
re-embeds — same fetch-isolated `honest` discipline, on the real
FINAL_TEMP_DEMO frame so segmentation angle / support masks are the
production ones (synthetic stripes put the carrier elsewhere).

Usage: python scripts/profile_temp_r05.py
"""
import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/scripts')
from vistaf_tpu.utils.jaxcache import enable as _enable

_enable()

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from profile_temp4k import honest  # noqa: E402

from vistaf_tpu.config import TempConfig
from vistaf_tpu.ops.color import bgr_to_gray
from vistaf_tpu.ops.filters import gaussian_blur_u8_round
from vistaf_tpu.ops.inpaint import inpaint_within_roi
from vistaf_tpu.ops.morphology import dilate, ellipse_kernel
from vistaf_tpu.temperature.inference import (TemperaturePipeline, clamp_map,
                                              fuse_maps_per_pixel,
                                              oriented_gaussian_blur)
from vistaf_tpu.temperature.segmentation import segment_stripes

REF = '/root/reference'


def main():
    cfg = TempConfig().deploy()
    pipe = TemperaturePipeline.from_artifacts(REF, cfg)
    frame = cv2.imread(f'{REF}/Final_demos_images/FINAL_TEMP_DEMO.jpg')
    fd = jax.device_put(jnp.asarray(frame))
    full_hw = frame.shape[:2]

    roi_full = jnp.asarray(pipe._roi_full)
    cb = pipe._compute_bbox
    print(f"compute bbox: {cb}  crop {cb[1]-cb[0]}x{cb[3]-cb[2]} "
          f"({100.0*(cb[1]-cb[0])*(cb[3]-cb[2])/(full_hw[0]*full_hw[1]):.0f}% of frame)")

    def crop(a):
        return a[cb[0]:cb[1], cb[2]:cb[3]]

    # ---- end-to-end rows --------------------------------------------------
    honest("FULL forward (all outputs)", pipe._forward, fd, n=10)

    def fwd_scalars(f):
        o = pipe._forward_impl(f)
        return (o["t_mean"], o["t_max"], o["t_std"], o["valid_pixels"])

    honest("forward (scalars only; embeds DCE'd)", jax.jit(fwd_scalars), fd, n=10)

    # ---- stage pieces, real intermediates ---------------------------------
    gray = jax.jit(bgr_to_gray)(fd)
    honest("bgr_to_gray full", jax.jit(bgr_to_gray), fd, n=10)

    def seg_all(g, r):
        s = segment_stripes(g, r, cfg, compute_bbox=cb)
        return (s.dark.astype(jnp.float32), s.light.astype(jnp.float32),
                s.sat.astype(jnp.float32), s.roi_eff.astype(jnp.float32),
                s.angle_rad, s.period_px)

    honest("segment_stripes (all outputs)", jax.jit(seg_all), gray, roi_full, n=10)
    seg = jax.jit(lambda g, r: segment_stripes(g, r, cfg, compute_bbox=cb))(
        gray, roi_full)

    def dput(a):
        # the axon tunnel rejects strided device_puts — always contiguous
        return jax.device_put(np.ascontiguousarray(np.asarray(a)))

    frame_c = dput(np.asarray(fd)[cb[0]:cb[1], cb[2]:cb[3]])
    roi_full_c = dput(np.asarray(roi_full)[cb[0]:cb[1], cb[2]:cb[3]])
    roi_eff_c = dput(np.asarray(seg.roi_eff)[cb[0]:cb[1], cb[2]:cb[3]])
    light_c = dput(np.asarray(seg.light)[cb[0]:cb[1], cb[2]:cb[3]])
    sat_c = dput(np.asarray(seg.sat)[cb[0]:cb[1], cb[2]:cb[3]])

    def feat_blur(f):
        ch = [gaussian_blur_u8_round(f[..., i].astype(jnp.float32),
                                     cfg.blur_ksize, vpu=cfg.conv_vpu)
              for i in range(3)]
        return jnp.stack(ch, axis=-1)

    honest("5x5 feature blur x3 (crop)", jax.jit(feat_blur), frame_c, n=10)
    blurred = jax.jit(feat_blur)(frame_c)

    k = ellipse_kernel(cfg.color_support_dilate | 1, cfg.color_support_dilate | 1)
    honest("light dilate (crop)", jax.jit(
        lambda m: dilate(m, k).astype(jnp.float32)), light_c, n=10)
    csup_pre = jax.jit(lambda l, r, s: dilate(l, k) & r & ~s)(light_c, roi_eff_c, sat_c)

    assert pipe._fused_fn is not None
    honest("fused LAB+chroma+2xpoly kernel (crop)", jax.jit(
        lambda b, r, c: pipe._fused_fn(b, r, c)), blurred, roi_eff_c, csup_pre, n=10)
    wide_raw, color_raw, csup = jax.jit(
        lambda b, r, c: pipe._fused_fn(b, r, c))(blurred, roi_eff_c, csup_pre)

    honest(f"wide inpaint {cfg.wide_inpaint_iters}it (crop)", jax.jit(
        lambda m, r: inpaint_within_roi(m, r, ~jnp.isfinite(m) & r,
                                        iters=cfg.wide_inpaint_iters,
                                        quantize_u8=True)), wide_raw, roi_full_c, n=10)
    honest(f"color inpaint {cfg.color_inpaint_iters}it (crop)", jax.jit(
        lambda m, r: inpaint_within_roi(m, r, ~jnp.isfinite(m) & r,
                                        iters=cfg.color_inpaint_iters,
                                        quantize_u8=True)), color_raw, csup, n=10)

    wide_map = jax.jit(lambda m, r: clamp_map(
        inpaint_within_roi(m, r, ~jnp.isfinite(m) & r,
                           iters=cfg.wide_inpaint_iters, quantize_u8=True),
        r, cfg.final_t_min, cfg.final_t_max))(wide_raw, roi_full_c)
    color_map = jax.jit(lambda m, r: clamp_map(
        inpaint_within_roi(m, r, ~jnp.isfinite(m) & r,
                           iters=cfg.color_inpaint_iters, quantize_u8=True),
        r, cfg.color_t_min - 5.0, cfg.color_t_max + 5.0))(color_raw, csup)

    honest("fuse+clamp (crop)", jax.jit(
        lambda r, w, c: fuse_maps_per_pixel(r, w, c, cfg)[0]),
        roi_full_c, wide_map, color_map, n=10)
    fused = jax.jit(lambda r, w, c: fuse_maps_per_pixel(r, w, c, cfg)[0])(
        roi_full_c, wide_map, color_map)

    honest("oriented shear blur (crop)", jax.jit(
        lambda m, r, a: oriented_gaussian_blur(
            m, r, a, cfg.final_smooth_sigma_across, cfg.final_smooth_sigma_along,
            method=cfg.rotate_method, vpu=cfg.conv_vpu)),
        fused, roi_full_c, seg.angle_rad, n=10)

    # the 8 full-frame re-embeds + masked stats tail, in one graph
    def embeds_and_stats(f, w, c, wr, cr, r):
        def embed(a, fill):
            full = jnp.full(full_hw + a.shape[2:], fill, a.dtype)
            return jax.lax.dynamic_update_slice(full, a, (cb[0], cb[2]) + (0,) * (a.ndim - 2))
        outs = [embed(f, jnp.nan), embed(f, jnp.nan), embed(w, jnp.nan),
                embed(c, jnp.nan), embed(wr, jnp.nan), embed(cr, jnp.nan),
                embed((c > 0).astype(jnp.uint8), 0), embed(r.astype(jnp.uint8), 0)]
        inside = r & jnp.isfinite(f)
        n = jnp.maximum(jnp.sum(inside.astype(jnp.float32)), 1.0)
        vals = jnp.where(inside, f, 0.0)
        tm = jnp.sum(vals) / n
        ts = jnp.sqrt(jnp.sum(jnp.where(inside, (f - tm) ** 2, 0.0)) / n)
        return tuple(outs) + (tm, ts)

    honest("8x full-frame embeds + stats", jax.jit(embeds_and_stats),
           fused, wide_map, color_map, wide_raw, color_raw, roi_full_c, n=10)


if __name__ == "__main__":
    main()

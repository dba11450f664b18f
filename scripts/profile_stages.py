"""Per-stage TPU timing at bench scale to find latency hot spots."""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np

from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair
from vistaf_tpu.ops import geometry

H, W = 480, 640
cfg = scaled_ftp_config(H, W).replace(percentile_method="hist")
ref, de = synthetic_pair(H, W, cfg)

cx, cy, r = geometry.circle_from_3_points(cfg.outer_circle_p1, cfg.outer_circle_p2, cfg.outer_circle_p3)
bbox = geometry.roi_crop_bbox(cx, cy, r, H, W)
x1, x2, y1, y2 = bbox
ch, cw = y2 - y1, x2 - x1
print(f"crop {ch}x{cw}")

rng = np.random.default_rng(0)
crop = jnp.asarray(rng.random((ch, cw)).astype(np.float32) * 255)
crop2 = jnp.asarray(rng.random((ch, cw)).astype(np.float32) * 255)
mask = jnp.asarray(geometry.circular_mask(ch, cw, cx - x1, cy - y1, min(r, 90)))
full = jnp.asarray(rng.random((H, W)).astype(np.float32))
phase = jnp.asarray((rng.random((ch, cw)).astype(np.float32) - 0.5) * 2)

def bench(name, fn, *args, n=10):
    jf = jax.jit(fn)
    out = jf(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jf(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:32s} {dt:8.2f} ms")
    return dt

from vistaf_tpu.ops.filters import gaussian_blur, hanning_window, masked_gaussian_smooth
from vistaf_tpu.ops.registration import phase_correlate, ecc_align
from vistaf_tpu.ops.unwrap import unwrap_wls
from vistaf_tpu.ops.distance import distance_transform_edt
from vistaf_tpu.ops.components import largest_component, label
from vistaf_tpu.ops.polyfit import robust_polyfit2d
from vistaf_tpu.ops.percentile import masked_percentile_hist, masked_percentile
from vistaf_tpu.ops.inpaint import inpaint_diffusion
from vistaf_tpu.ftp.demod import ftp_complex_demod

hann = jnp.asarray(hanning_window(H, W))
bench("phase_correlate(full)", lambda a, b: phase_correlate(a, b, hann), full, full)
bench("gaussian_blur s=9 crop", lambda x: gaussian_blur(x, 8.7), crop)
bench("ecc 60it", lambda t, i, m: ecc_align(t, i, m, max_iters=60), crop, crop2, mask)
bench("demod", lambda g: ftp_complex_demod(g, None, cfg), crop)
bench("unwrap cg30", lambda w, m: unwrap_wls(w, m, cg_iters=30), phase, mask)
bench("edt", distance_transform_edt, mask)
bench("largest_component", largest_component, mask)
bench("polyfit o2 (hist)", lambda z, m: robust_polyfit2d(z, m, order=2, percentile_method='hist'), phase, mask)
bench("pctl hist", lambda z, m: masked_percentile_hist(z, m, 25.0), phase, mask)
bench("pctl sort", lambda z, m: masked_percentile(z, m, 25.0), phase, mask)
bench("inpaint 64it", lambda z, m: inpaint_diffusion(z, m, iters=64), crop, mask)
bench("masked_smooth s2.5", lambda z, m: masked_gaussian_smooth(z, m, 2.5), phase, mask)

"""Round-4 hotspot attribution for the remaining ~87 ms 4K deploy force path.

profile_force4k.py says align=43 / reliable=+21 / unwrap=+14 / demod=+11 ms;
profile_align4k.py accounts for only ~24 ms of align.  This script times the
unmeasured suspects with the honest in-graph-repetition method: the post-ECC
full-crop shear warp, and each sub-op of the reliable mask (quality blur,
p25 percentile, morph close, largest CC, distance erode) at the 4K crop.

Usage: python scripts/profile_r04_hotspots.py [deploy|parity]
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

from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ftp.demod import ftp_complex_demod_pair
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.ops.color import bgr_to_gray
from vistaf_tpu.ops.filters import gaussian_blur
from vistaf_tpu.ops.morphology import close as morph_close
from vistaf_tpu.ops.morphology import ellipse_kernel
from vistaf_tpu.ops.components import dominant_component
from vistaf_tpu.ops.distance import erode_by_distance
from vistaf_tpu.ops.percentile import get_percentile_fn
from vistaf_tpu.ops.warp import warp_affine_inverse_shear

REF = "/root/reference/Final_demos_images/FINAL_reference.jpg"
DEF = "/root/reference/Final_demos_images/FINAL_E_deformed.jpg"
P2H = {"type": "hinge_saturating",
       "params": {"a": 2.0826540593, "b": 4.2044134334, "c": 0.0}}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "deploy"
    cfg = FTPConfig().deploy() if mode == "deploy" else FTPConfig()
    pipe = FTPPipeline(cfg, P2H)
    g = pipe.geom
    x1, x2, y1, y2 = g.bbox
    print(f"mode={mode} crop={g.crop_h}x{g.crop_w} shear_k={cfg.ecc_shear_k}",
          flush=True)

    ref = cv2.imread(REF, cv2.IMREAD_COLOR)
    de = cv2.imread(DEF, cv2.IMREAD_COLOR)
    ref_gray = np.asarray(bgr_to_gray(jnp.asarray(ref)))[y1:y2, x1:x2]
    def_gray = np.asarray(bgr_to_gray(jnp.asarray(de)))[y1:y2, x1:x2]
    rg = jax.device_put(ref_gray)
    dg = jax.device_put(def_gray)
    roi = jax.device_put(np.asarray(pipe._roi_eroded))
    apo = jnp.asarray(pipe._apo) if pipe._apo is not None else None
    pctl = get_percentile_fn(cfg.percentile_method)

    # --- post-ECC warp of the full-res crop (suspected missing align cost)
    warp = jnp.asarray([[1.0, 3e-3, 1.2], [-3e-3, 1.0, -0.8]], jnp.float32)
    honest("warp_affine_inverse_shear (crop)",
           lambda img: warp_affine_inverse_shear(img, warp, K=cfg.ecc_shear_k,
                                                 border="reflect"), dg)

    # --- demod pair (for reference against the through-demod delta)
    dref, ddef = jax.jit(lambda a, b: ftp_complex_demod_pair(a, b, apo, cfg))(rg, dg)
    q0 = jax.device_put(np.asarray(dref.amp * ddef.amp))
    honest("demod pair (crop)",
           lambda a, b: ftp_complex_demod_pair(a, b, apo, cfg)[0].amp, rg, dg)

    # --- reliable-mask sub-ops at crop scale
    honest("quality blur s%g" % cfg.quality_smooth_sigma_px,
           lambda q: gaussian_blur(q, cfg.quality_smooth_sigma_px,
                                   vpu=cfg.conv_vpu), q0)
    q1 = gaussian_blur(q0, cfg.quality_smooth_sigma_px, vpu=cfg.conv_vpu)
    honest("p25 percentile (%s)" % cfg.percentile_method,
           lambda q: pctl(q, roi, cfg.amp_valid_percentile), q1)
    thr = pctl(q1, roi, cfg.amp_valid_percentile)
    rel0 = np.asarray(roi & (q1 >= thr) & jnp.isfinite(q1))
    rel0_d = jax.device_put(rel0)
    ksz = max(3, cfg.valid_close_kernel | 1)
    honest("morph close k%d x%d" % (ksz, cfg.valid_close_iters),
           lambda m: morph_close(m, ellipse_kernel(ksz, ksz),
                                 iterations=cfg.valid_close_iters) & roi, rel0_d)
    rel1 = morph_close(rel0_d, ellipse_kernel(ksz, ksz),
                       iterations=cfg.valid_close_iters) & roi
    rel1_d = jax.device_put(np.asarray(rel1))
    honest("largest CC (%s)" % cfg.largest_cc_method,
           lambda m: dominant_component(m) & roi, rel1_d)
    rel2 = dominant_component(rel1_d) & roi
    rel2_d = jax.device_put(np.asarray(rel2))
    honest("erode_by_distance %dpx (%s)" % (cfg.reliable_edge_margin_px,
                                            cfg.distance_metric),
           lambda m: erode_by_distance(m, cfg.reliable_edge_margin_px,
                                       metric=cfg.distance_metric), rel2_d)


if __name__ == "__main__":
    main()

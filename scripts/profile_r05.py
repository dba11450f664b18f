"""Round-5 attribution of the remaining ~44 ms 4K deploy force path.

profile_r04_hotspots.py at HEAD: demod pair 10.0, largest CC 4.9 ms;
profile_align4k.py: phase-correlate ~10.6 (incl. blur), ECC ds=2 ~11 ms.
This script splits those four into sub-ops and times the candidate
replacements next to them:

- demod preprocess pieces (inpaint 64 iters, illum blur s45, percentiles)
  vs the fft2 + patch-IDFT tail, and rfft2 as the forward-transform
  alternative (the sideband patch lives in the right half-plane);
- phase correlation full-frame vs a 2048^2 window around the ROI bbox
  (full resolution — no pooling, so the round-3 roundoff incident does
  not apply);
- largest-CC seed_edt pieces: EDT seed vs geodesic reconstruct, and a
  ds-pooled EDT seed alternative;
- unwrap_wls at uds=4 on the real wrapped phase.

Usage: python scripts/profile_r05.py [deploy|parity] [section ...]
Sections: demod gshift cc unwrap (default: all).  Run one section per
process on slow-compile hosts; the persistent compile cache makes
re-runs cheap.
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
from vistaf_tpu.ftp import demod as demod_mod
from vistaf_tpu.ftp.demod import ftp_complex_demod_pair, _preprocess
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.ops import fftops
from vistaf_tpu.ops.color import bgr_to_gray
from vistaf_tpu.ops.distance import distance_transform_edt
from vistaf_tpu.ops.filters import gaussian_blur, gradient_magnitude
from vistaf_tpu.ops.filters import hanning_window
from vistaf_tpu.ops.inpaint import inpaint_diffusion
from vistaf_tpu.ops.components import dominant_component
from vistaf_tpu.ops.morphology import reconstruct
from vistaf_tpu.ops.percentile import get_percentile_fn
from vistaf_tpu.ops.registration import phase_correlate
from vistaf_tpu.ops.unwrap import unwrap_wls

REF = "/root/reference/Final_demos_images/FINAL_reference.jpg"
DEF = "/root/reference/Final_demos_images/FINAL_E_deformed.jpg"
P2H = {"type": "hinge_saturating",
       "params": {"a": 2.0826540593, "b": 4.2044134334, "c": 0.0}}


def sec_demod(cfg, pipe, stack, apo):
    pctl = get_percentile_fn(cfg.percentile_method)
    rg = stack[0]
    valid = (apo > 1e-6) if apo is not None else jnp.ones(rg.shape, bool)
    honest("demod: preprocess pair",
           lambda s: jax.vmap(lambda x: _preprocess(x, apo, cfg)[0])(s),
           stack)
    honest("demod: grad-mag pair",
           lambda s: jax.vmap(gradient_magnitude)(s), stack)
    honest("demod: bad-pixel percentiles pair",
           lambda s: jax.vmap(lambda im: pctl(im, valid,
                                              (cfg.bad_intensity_percentile,
                                               cfg.bad_gradient_percentile)))(s),
           stack)
    bad = jnp.zeros(rg.shape, bool).at[400:420, 400:440].set(True)
    honest(f"demod: inpaint_diffusion x{cfg.inpaint_iters} pair",
           lambda s: jax.vmap(lambda im: inpaint_diffusion(
               im, bad, iters=cfg.inpaint_iters))(s), stack)
    honest("demod: illum blur s45 pair",
           lambda s: jax.vmap(lambda im: gaussian_blur(
               im, cfg.illum_sigma_px, vpu=cfg.conv_vpu))(s), stack)
    honest("demod: pre-blur s1.5 pair",
           lambda s: jax.vmap(lambda im: gaussian_blur(
               im, cfg.pre_blur_sigma_px, vpu=cfg.conv_vpu))(s), stack)

    iw_pair = jax.jit(jax.vmap(lambda x: _preprocess(x, apo, cfg)[0]))(stack)
    pad = int(max(0, cfg.fft_pad_px))
    iw_fft = jnp.pad(iw_pair, ((0, 0), (pad, pad), (pad, pad)),
                     mode="symmetric") if pad else iw_pair
    _, hf, wf = iw_fft.shape
    print(f"fft shape {hf}x{wf}", flush=True)
    honest("demod: fft2 c64 pair", lambda s: jnp.fft.fft2(s, axes=(-2, -1)),
           iw_fft)
    honest("demod: rfft2 pair", lambda s: jnp.fft.rfft2(s, axes=(-2, -1)),
           iw_fft)
    F_shift = jax.jit(lambda s: jnp.fft.fftshift(
        jnp.fft.fft2(s, axes=(-2, -1)), axes=(-2, -1)))(iw_fft)
    ref_mag = jnp.abs(F_shift[0])
    honest("demod: carrier cascade + refine",
           lambda m: fftops.refine_peak_parabolic_log(
               m, *demod_mod._search_carrier(m, hf, wf, cfg)), ref_mag)

    bw = int(max(3, cfg.patch_half_width_bins))
    psz = 2 * bw + 1
    cy, cx = hf // 2, wf // 2
    patch = jax.lax.dynamic_slice(
        F_shift, (0, cy - bw + 17, cx - bw + 17), (2, psz, psz))

    def patch_tail(p):
        field = fftops.ifft2_sparse_patch(p, hf, wf, cy - psz // 2,
                                          cx - psz // 2)
        return field * fftops.frac_ramp(hf, wf, jnp.float32(0.3),
                                        jnp.float32(-0.2), sign=-1.0)[None]
    honest("demod: sparse-patch IDFT + ramp pair", patch_tail, patch)


def sec_gshift(cfg, pipe, gray_full, bbox):
    x1, x2, y1, y2 = bbox
    blur_fn = jax.vmap(lambda x: gaussian_blur(
        x, cfg.global_shift_blur_sigma, vpu=cfg.conv_vpu))
    blurred = jax.jit(blur_fn)(gray_full)
    hann_full = jnp.asarray(pipe._hann_full)
    honest("gshift: blur s7 full pair", blur_fn, gray_full)
    honest("gshift: phase_correlate full",
           lambda b: phase_correlate(b[0], b[1], hann_full), blurred)
    # windowed alternative: 2048^2 full-res crop centered on the ROI bbox
    cyb = (y1 + y2) // 2
    cxb = (x1 + x2) // 2
    H, W = gray_full.shape[1:]
    wy0 = min(max(0, cyb - 1024), H - 2048)
    wx0 = min(max(0, cxb - 1024), W - 2048)
    hann_w = jnp.asarray(hanning_window(2048, 2048))
    win = blurred[:, wy0:wy0 + 2048, wx0:wx0 + 2048]

    honest("gshift: blur s7 window pair (2048^2)",
           lambda gf: blur_fn(gf[:, wy0:wy0 + 2048, wx0:wx0 + 2048]),
           gray_full)
    honest("gshift: phase_correlate window 2048^2",
           lambda b: phase_correlate(b[0], b[1], hann_w), win)
    dxf, dyf, _ = jax.jit(lambda b: phase_correlate(b[0], b[1], hann_full))(blurred)
    dxw, dyw, _ = jax.jit(lambda b: phase_correlate(b[0], b[1], hann_w))(win)
    print(f"  full ({float(dxf):+.3f},{float(dyf):+.3f}) "
          f"window ({float(dxw):+.3f},{float(dyw):+.3f})", flush=True)


def sec_cc(crop_shape):
    yy = jax.lax.broadcasted_iota(jnp.int32, crop_shape, 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, crop_shape, 1)
    r2 = (yy - crop_shape[0] // 2) ** 2 + (xx - crop_shape[1] // 2) ** 2
    mask = (r2 < (min(crop_shape) // 3) ** 2)
    mask = mask.at[10:40, 10:40].set(True)   # a distractor blob
    honest("cc: EDT (jump flooding)", distance_transform_edt, mask)
    honest("cc: dominant_component (seed_edt)",
           lambda m: dominant_component(m), mask)

    def pooled_seed_dominant(m, ds=4):
        h, w = m.shape
        hh, ww = (h // ds) * ds, (w // ds) * ds
        mp = m[:hh, :ww].reshape(hh // ds, ds, ww // ds, ds).all(axis=(1, 3))
        dist = distance_transform_edt(mp)
        sf = jnp.argmax(dist.ravel())
        sy = (sf // mp.shape[1]).astype(jnp.int32) * ds + ds // 2
        sx = (sf % mp.shape[1]).astype(jnp.int32) * ds + ds // 2
        seed = ((jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) == sy)
                & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) == sx)) & m
        return reconstruct(seed, m)
    honest("cc: pooled-EDT seed (ds=4) + reconstruct", pooled_seed_dominant,
           mask)
    return mask


def sec_unwrap(cfg, stack, apo, mask):
    rg, dg = stack[0], stack[1]
    dref, ddef = jax.jit(
        lambda a, b: ftp_complex_demod_pair(a, b, apo, cfg))(rg, dg)
    ratio = ddef.complex_demod * jnp.conj(dref.complex_demod)
    pw = jnp.angle(ratio).astype(jnp.float32)
    honest(f"unwrap_wls uds={cfg.unwrap_downsample} cg={cfg.unwrap_cg_iters}",
           lambda p: unwrap_wls(p, mask, cg_iters=cfg.unwrap_cg_iters,
                                tol=cfg.unwrap_cg_tol,
                                downsample=cfg.unwrap_downsample), pw)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "deploy"
    sections = set(sys.argv[2:]) or {"demod", "gshift", "cc", "unwrap"}
    cfg = FTPConfig().deploy() if mode == "deploy" else FTPConfig()
    pipe = FTPPipeline(cfg, P2H)
    g = pipe.geom
    x1, x2, y1, y2 = g.bbox
    print(f"mode={mode} crop={g.crop_h}x{g.crop_w} pad={cfg.fft_pad_px}",
          flush=True)

    ref = cv2.imread(REF, cv2.IMREAD_COLOR)
    de = cv2.imread(DEF, cv2.IMREAD_COLOR)
    gray_full = jax.jit(jax.vmap(bgr_to_gray))(
        jnp.asarray(np.stack([ref, de])))
    rg = gray_full[0, y1:y2, x1:x2]
    dg = gray_full[1, y1:y2, x1:x2]
    stack = jnp.stack([rg, dg])
    apo = jnp.asarray(pipe._apo) if pipe._apo is not None else None

    if "demod" in sections:
        sec_demod(cfg, pipe, stack, apo)
    if "gshift" in sections:
        sec_gshift(cfg, pipe, gray_full, g.bbox)
    mask = None
    if "cc" in sections or "unwrap" in sections:
        mask = sec_cc((g.crop_h, g.crop_w)) if "cc" in sections else None
    if "unwrap" in sections:
        if mask is None:
            yy = jax.lax.broadcasted_iota(jnp.int32, rg.shape, 0)
            xx = jax.lax.broadcasted_iota(jnp.int32, rg.shape, 1)
            r2 = (yy - rg.shape[0] // 2) ** 2 + (xx - rg.shape[1] // 2) ** 2
            mask = (r2 < (min(rg.shape) // 3) ** 2)
        sec_unwrap(cfg, stack, apo, mask)


if __name__ == "__main__":
    main()

"""Honest per-stage device timing of the native-4K temperature path.

Same fetch-isolated timing discipline as profile_honest.py (block_until_ready
is untrustworthy on the tunneled axon platform): each stage is jitted with a
scalarizing reduction, enqueued N times, and timed by the final host fetch.

Stages mirror TemperaturePipeline._forward_impl (temperature/inference.py)
at 3840x2160 so the sum should roughly reproduce BENCH_STREAMS' ~690 ms
deploy p50 and expose where the budget actually goes.
"""
import sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np

H, W = 2160, 3840
N_DEFAULT = 20


def honest(name, jf, *args, n=N_DEFAULT):
    """Time ``n`` executions folded into ONE jitted fori_loop: the 4K frame
    crosses the tunnel once and a single scalar comes back, so per-call
    transfer cost (24 MB/frame, which dwarfs device time at this scale)
    never enters the measurement.  A carry*eps perturbation of the first
    float argument chains the iterations so XLA cannot CSE them away."""
    def scalarized(*a):
        out = jf(*a)
        leaves = jax.tree_util.tree_leaves(out)
        tot = jnp.float32(0.0)
        for leaf in leaves:     # reduce EVERY output so none is DCE'd
            lf = jnp.asarray(leaf).astype(jnp.float32)
            tot = tot + jnp.sum(jnp.where(jnp.isfinite(lf), lf, 0.0))
        return tot

    def _perturb(x, c):
        x = jnp.asarray(x)
        if x.dtype == jnp.bool_:
            return jnp.logical_xor(x, c < -1.0)          # dynamic all-False
        if jnp.issubdtype(x.dtype, jnp.integer):
            return (x.astype(jnp.float32) + c * 1e-30).astype(x.dtype)
        return x + (c * 1e-30).astype(x.dtype)

    def make_repeated(k):
        def repeated(*a):
            def body(_, c):
                aa = list(a)
                aa[0] = _perturb(aa[0], c)
                return scalarized(*aa)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))
        return jax.jit(repeated)

    k0 = 3
    ja, jb = make_repeated(k0), make_repeated(k0 + n)
    _ = float(ja(*args)); _ = float(jb(*args))   # compile + warm
    t0 = time.perf_counter(); _ = float(ja(*args))
    t_a = time.perf_counter() - t0               # k0 execs + transfer + rtt
    t0 = time.perf_counter(); _ = float(jb(*args))
    t_b = time.perf_counter() - t0               # k0+n execs + transfer + rtt
    dt = max(t_b - t_a, 0.0) / n * 1e3
    print(f"{name:40s} {dt:9.2f} ms/exec", flush=True)
    return dt


def main():
    """Profiles the stages exactly as the chosen preset runs them: at the
    pipeline's static compute bbox when cfg.crop_compute (deploy crops the
    per-pixel stages to the outer-ROI bbox and re-embeds) and with the
    preset's rotate_method/conv_vpu routing.  Usage:
    python scripts/profile_temp4k.py [deploy|parity]
    """
    mode = sys.argv[1] if len(sys.argv) > 1 else "deploy"
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)

    from vistaf_tpu.config import TempConfig
    from vistaf_tpu.calib.temp_weights import load_reference_models
    from vistaf_tpu.temperature.inference import (TemperaturePipeline,
                                                  fuse_maps_per_pixel,
                                                  oriented_gaussian_blur)
    from vistaf_tpu.temperature.segmentation import segment_stripes
    from vistaf_tpu.ops.color import bgr_to_gray
    from vistaf_tpu.ops.filters import gaussian_blur_u8_round
    from vistaf_tpu.ops.inpaint import inpaint_within_roi
    from vistaf_tpu.ops.morphology import dilate, ellipse_kernel

    cfg = TempConfig().deploy() if mode == "deploy" else TempConfig()
    data_root = "/root/reference"
    color, wide = load_reference_models(data_root)
    pipe = TemperaturePipeline(cfg, color, wide)
    roi_full = np.asarray(pipe._roi_full)
    roi = jnp.asarray(roi_full)

    cb = pipe._compute_bbox

    def crop(a):
        return a[cb[0]:cb[1], cb[2]:cb[3]] if cb is not None else a

    ch_, cw_ = ((cb[1] - cb[0], cb[3] - cb[2]) if cb is not None else (H, W))
    print(f"preset={mode}  compute bbox = {ch_}x{cw_} "
          f"({100.0 * ch_ * cw_ / (H * W):.0f}% of frame)", flush=True)

    gray = np.asarray(bgr_to_gray(jnp.asarray(frame)))
    plane = rng.random((H, W)).astype(np.float32) * 20 + 20
    holes = (rng.random((H, W)) > 0.98) & roi_full
    nanmap = np.where(holes, np.nan, plane).astype(np.float32)
    csup = roi_full & (rng.random((H, W)) > 0.5)

    frame_c, roi_c = crop(frame), crop(roi_full)
    plane_c, holes_c = crop(plane), crop(holes)
    nanmap_c, csup_c = crop(nanmap), crop(csup)

    # full-frame stages (run pre-crop in the pipeline)
    honest("bgr_to_gray (full)", jax.jit(lambda f: bgr_to_gray(f)), frame)

    # reduce EVERY segmentation output: reducing only roi_eff dead-codes the
    # entire FFT/carrier/ifft2/morphology path (roi_eff needs just the
    # saturation mask) — that blind spot hid ~60 ms of the round-3 deploy
    # budget (scripts/profile_seg4k.py has the per-piece breakdown)
    def seg_all(g):
        s = segment_stripes(g, roi, cfg, compute_bbox=cb)
        return (s.dark.astype(jnp.float32), s.light.astype(jnp.float32),
                s.angle_rad, s.period_px)
    honest("segment_stripes (all outputs)", jax.jit(seg_all), gray)
    # per-pixel stages at the preset's compute extent
    honest("blur5x5 u8 x3ch", jax.jit(lambda f: sum(
        gaussian_blur_u8_round(f[..., i].astype(jnp.float32), cfg.blur_ksize,
                               vpu=cfg.conv_vpu) for i in range(3))), frame_c)
    honest("dilate13", jax.jit(lambda m: dilate(m, ellipse_kernel(13, 13)).astype(jnp.float32)),
           csup_c)
    if pipe._fused_fn is not None:
        honest("fused LAB+2models", lambda f, r, c: pipe._fused_fn(f, r, c),
               frame_c.astype(np.float32), roi_c, csup_c, n=10)
    honest(f"inpaint wide ({cfg.wide_inpaint_iters}it, u8)",
           jax.jit(lambda z, r, m: inpaint_within_roi(z, r, m, iters=cfg.wide_inpaint_iters,
                                                      quantize_u8=True)),
           nanmap_c, roi_c, holes_c, n=10)
    honest(f"inpaint color ({cfg.color_inpaint_iters}it, u8)",
           jax.jit(lambda z, r, m: inpaint_within_roi(z, r, m, iters=cfg.color_inpaint_iters,
                                                      quantize_u8=True)),
           nanmap_c, csup_c, holes_c & csup_c, n=10)
    honest("fuse_per_pixel", jax.jit(lambda r, wm, cm: fuse_maps_per_pixel(r, wm, cm, cfg)[0]),
           roi_c, plane_c, nanmap_c)
    honest(f"oriented_blur ({cfg.rotate_method})",
           jax.jit(lambda m, r: oriented_gaussian_blur(m, r, jnp.float32(0.3),
                                                       cfg.final_smooth_sigma_across,
                                                       cfg.final_smooth_sigma_along,
                                                       method=cfg.rotate_method,
                                                       vpu=cfg.conv_vpu)),
           plane_c, roi_c, n=10)


if __name__ == "__main__":
    main()

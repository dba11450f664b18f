"""Sub-stage device timing of the native-4K align stage (the dominant
cost in BENCH_4K deploy: ~95 of ~165 ms, scripts/profile_force4k.py).

Same fetch-isolated fori_loop discipline as profile_temp4k.py.  Breaks
`FTPPipeline._forward_impl`'s pre-demod work into: gray conversion,
global-shift blur, phase correlation, bilinear translation, ECC pre-blur,
and the ECC GN solve (at full res and with ecc_downsample=2).

Usage: python scripts/profile_align4k.py [deploy|parity]
"""
import sys, time
sys.path.insert(0, '/root/repo')
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()
import cv2
import jax, jax.numpy as jnp, numpy as np

from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.ops.color import bgr_to_gray
from vistaf_tpu.ops.filters import gaussian_blur
from vistaf_tpu.ops.registration import phase_correlate, ecc_align
from vistaf_tpu.ops.warp import translate_bilinear

sys.path.insert(0, '/root/repo/scripts')
from profile_temp4k import honest  # noqa: E402

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

    ref = jnp.asarray(cv2.imread(REF, cv2.IMREAD_COLOR))
    de = jnp.asarray(cv2.imread(DEF, cv2.IMREAD_COLOR))
    print(f"mode={mode} crop={g.crop_h}x{g.crop_w}", flush=True)

    gray = jax.jit(jax.vmap(bgr_to_gray))(jnp.stack([ref, de]))
    hann = jnp.asarray(pipe._hann_full)
    circ = jnp.asarray(pipe._circ_mask)

    honest("gray pair (2x 4K)", jax.vmap(bgr_to_gray), jnp.stack([ref, de]))
    blur_fn = jax.vmap(lambda x: gaussian_blur(
        x, cfg.global_shift_blur_sigma, vpu=cfg.conv_vpu))
    honest("global-shift blur s7 (2x 4K)", blur_fn, gray)
    blurred = jax.jit(blur_fn)(gray)
    honest("phase_correlate (4K)",
           lambda a: phase_correlate(a[0], a[1], hann), blurred)
    honest("translate_bilinear (4K)",
           lambda x: translate_bilinear(x, jnp.float32(1.3), jnp.float32(-0.7),
                                        max_shift=cfg.global_shift_max_px),
           gray[1])

    crop01 = jnp.stack([gray[0, y1:y2, x1:x2], gray[1, y1:y2, x1:x2]]) / 255.0
    honest("ecc pre-blur s5 (2x crop)",
           jax.vmap(lambda x: gaussian_blur(x, cfg.ecc_gauss_filt,
                                            vpu=cfg.conv_vpu)), crop01)
    crop_b = jax.jit(jax.vmap(
        lambda x: gaussian_blur(x, cfg.ecc_gauss_filt, vpu=cfg.conv_vpu)))(crop01)

    def run_ecc(c01, m, shear_k, loop_kernel=None):
        # NOTE: the ds=4-pooled crop (296x384 padded) lands inside the
        # ecc_loop megakernel's fits_vmem budget and compiles fine as a
        # plain jit (bench.py runs it), but THIS harness's fori_loop +
        # closed_call wrapper pushes the while-body stack allocation over
        # the 16 MB scoped-vmem limit — so the pooled variants measure the
        # XLA loop instead (production-representative for ds=2, where the
        # pooled crop is beyond the kernel budget anyway).
        lk = cfg.ecc_loop_kernel if loop_kernel is None else loop_kernel
        return ecc_align(c01[0], c01[1], m, mode=cfg.ecc_warp_mode,
                         max_iters=cfg.ecc_iters, eps=cfg.ecc_eps,
                         stride=cfg.ecc_stride, sampler=cfg.ecc_sampler,
                         shear_k=shear_k,
                         stall_patience=cfg.ecc_stall_patience,
                         loop_kernel=lk)

    honest("ecc_align full-res", lambda c: run_ecc(c, circ, cfg.ecc_shear_k),
           crop_b, n=5)

    for ds in (2, 4):
        hh = (g.crop_h // ds) * ds
        ww = (g.crop_w // ds) * ds
        pooled = crop_b[:, :hh, :ww].reshape(
            2, hh // ds, ds, ww // ds, ds).mean(axis=(2, 4))
        circ_p = (circ[:hh, :ww].astype(jnp.float32).reshape(
            hh // ds, ds, ww // ds, ds).mean(axis=(1, 3)) > 0.5)
        k = max(4, -(-cfg.ecc_shear_k // ds))
        honest(f"ecc_align ds={ds} (incl. pool)",
               lambda c, ds=ds, hh=hh, ww=ww, k=k, circ_p=circ_p: run_ecc(
                   c[:, :hh, :ww].reshape(2, hh // ds, ds, ww // ds, ds)
                   .mean(axis=(2, 4)), circ_p, k, loop_kernel=False),
               crop_b, n=5)


if __name__ == "__main__":
    main()

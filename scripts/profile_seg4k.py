"""Honest timing of segment_stripes internals at native 4K.

profile_temp4k.py's 'segment_stripes' row reduced only roi_eff, which
dead-code-eliminates the whole FFT/carrier/ifft2/morphology path (roi_eff
only needs the saturation mask) — so the segmentation cost never appeared
in any stage table.  This script times the full segmentation (all outputs
reduced) and each internal piece.  Usage: python scripts/profile_seg4k.py
"""
import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/scripts')

import jax
import jax.numpy as jnp
import numpy as np

from profile_temp4k import honest  # noqa: E402

from vistaf_tpu.config import TempConfig
from vistaf_tpu.ops import fftops
from vistaf_tpu.ops.filters import gaussian_blur
from vistaf_tpu.ops.morphology import close as morph_close
from vistaf_tpu.ops.morphology import open_ as morph_open, rect_kernel
from vistaf_tpu.ops.percentile import get_percentile_fn
from vistaf_tpu.temperature.segmentation import segment_stripes

H, W = 2160, 3840


def main():
    cfg = TempConfig().deploy()
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[:H, :W].astype(np.float32)
    stripes = 128 + 60 * np.sin(2 * np.pi * (xx * 0.02 + yy * 0.002))
    gray = np.clip(stripes + rng.normal(0, 4, (H, W)), 0, 255).astype(np.float32)
    cy, cx = H // 2, W // 2
    roi = ((yy - cy) ** 2 + (xx - cx) ** 2) < (0.4 * H) ** 2
    g = jax.device_put(gray)
    r = jax.device_put(roi)

    def seg_all(gr, ro):
        s = segment_stripes(gr, ro, cfg)
        return (s.dark.astype(jnp.float32), s.light.astype(jnp.float32),
                s.angle_rad, s.period_px)

    honest("segment_stripes (ALL outputs)", jax.jit(seg_all), g, r, n=10)

    honest("fft2 c64 full", jax.jit(lambda x: jnp.fft.fft2(x)), g, n=10)
    honest("fft2+shift+abs", jax.jit(lambda x: jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(x)))), g, n=10)
    # keep complex on device: c64 fetches are UNIMPLEMENTED over the tunnel
    Fd = jax.jit(lambda x: jnp.fft.fftshift(jnp.fft.fft2(x)))(g)
    magd = jax.jit(lambda Fs: jnp.abs(Fs))(Fd)
    honest("topk peaks", jax.jit(lambda m: jnp.stack(
        fftops.find_top_peaks(m, cfg.seg_dc_exclusion, cfg.seg_n_peaks)[:2]).astype(jnp.float32)),
        magd, n=10)

    bp = jax.device_put((np.hypot(xx - (cx + 70), yy - cy) <= cfg.seg_band_radius))
    honest("mask+ifftshift+ifft2 full", jax.jit(
        lambda Fs, m: jnp.real(jnp.fft.ifft2(jnp.fft.ifftshift(Fs * m)))), Fd, bp, n=10)

    honest(f"illum blur s{cfg.seg_illum_sigma}", jax.jit(
        lambda x: gaussian_blur(x, float(cfg.seg_illum_sigma), vpu=cfg.conv_vpu)), g, n=10)

    pfn = get_percentile_fn(cfg.percentile_method)
    honest("median (p50) full", jax.jit(lambda x, m: pfn(x, m, 50.0)), g, r, n=10)

    k_close = rect_kernel(cfg.post_close_ky | 1, cfg.post_close_kx | 1)
    k_open = rect_kernel(cfg.post_open_ky | 1, cfg.post_open_kx | 1)
    mk = jax.device_put(roi & (stripes > 128))
    honest(f"morph close{k_close.shape}+open{k_open.shape}", jax.jit(
        lambda m: (morph_open(morph_close(m, k_close), k_open)).astype(jnp.float32)), mk, n=10)


if __name__ == "__main__":
    main()

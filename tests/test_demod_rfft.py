"""The half-spectrum (rfft2) demod-pair fast path vs the full-fft2 path.

``ftp_complex_demod_pair`` takes the rfft branch when the carrier search is
right-half-plane-constrained with the cascade picker (the deploy preset).
The input is real, so the right half-plane carries the full information
content: every patch bin must equal its full-fft2 counterpart up to
rfft-vs-fft rounding dust, and the carrier pick must be identical.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vistaf_tpu.ftp.demod import ftp_complex_demod_pair
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.ops.color import bgr_to_gray
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

P2H = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}


def _crop_pair(cfg):
    pipe = FTPPipeline(cfg, P2H)
    x1, x2, y1, y2 = pipe.geom.bbox
    ref, de = synthetic_pair(cfg.image_height, cfg.image_width, cfg)
    gray = jax.vmap(bgr_to_gray)(jnp.asarray(np.stack([ref, de])))
    apo = jnp.asarray(pipe._apo) if pipe._apo is not None else None
    return gray[0, y1:y2, x1:x2], gray[1, y1:y2, x1:x2], apo


def test_demod_pair_rfft_matches_full_fft():
    cfg = scaled_ftp_config(480, 640).deploy()
    assert cfg.peak_method == "cascade" and cfg.force_right_half_plane
    rg, dg, apo = _crop_pair(cfg)

    d_r, e_r = ftp_complex_demod_pair(rg, dg, apo, cfg)
    # peak_method='topk' forces the full-fft2 branch; on this clean carrier
    # both pickers choose the same bin, so the only remaining difference is
    # the transform route
    d_f, e_f = ftp_complex_demod_pair(rg, dg, apo, cfg.replace(peak_method="topk"))

    np.testing.assert_allclose(np.asarray(d_r.peak_f), np.asarray(d_f.peak_f),
                               rtol=0, atol=1e-5)
    for a, b in ((d_r, d_f), (e_r, e_f)):
        fa, fb = np.asarray(a.complex_demod), np.asarray(b.complex_demod)
        rel = np.abs(fa - fb).max() / np.abs(fb).max()
        assert rel < 1e-5, rel


def test_demod_pair_rfft_low_frequency_carrier_uses_mirror_columns():
    """A carrier at kx < patch_half_width_bins makes the sideband patch
    reach into negative-kx columns, which the rfft path reconstructs from
    Hermitian symmetry — the case the mirror extension exists for."""
    cfg = scaled_ftp_config(480, 640).deploy()
    # widen the grating so the carrier sits below bw bins: kx ~ wf/period
    h, w = 480, 640
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    period = 90.0                      # kx ~ (croppedfft)/90 ~ 5 < bw=10
    base = 128 + 60 * np.sin(2 * np.pi * xx / period)
    img = np.repeat(np.clip(base, 0, 255)[..., None], 3, axis=2).astype(np.uint8)
    pipe = FTPPipeline(cfg, P2H)
    x1, x2, y1, y2 = pipe.geom.bbox
    gray = jax.vmap(bgr_to_gray)(jnp.asarray(np.stack([img, img])))
    rg, dg = gray[0, y1:y2, x1:x2], gray[1, y1:y2, x1:x2]
    apo = jnp.asarray(pipe._apo) if pipe._apo is not None else None

    d_r, _ = ftp_complex_demod_pair(rg, dg, apo, cfg)
    d_f, _ = ftp_complex_demod_pair(rg, dg, apo, cfg.replace(peak_method="topk"))
    assert float(d_r.k[0]) < cfg.patch_half_width_bins  # the low-kx regime
    np.testing.assert_allclose(np.asarray(d_r.peak_f), np.asarray(d_f.peak_f),
                               rtol=0, atol=1e-4)
    fa, fb = np.asarray(d_r.complex_demod), np.asarray(d_f.complex_demod)
    rel = np.abs(fa - fb).max() / np.abs(fb).max()
    assert rel < 1e-5, rel

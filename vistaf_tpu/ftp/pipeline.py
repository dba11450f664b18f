"""Full FTP forward pass: frame pair -> calibrated mm depth map.

One jitted graph reproducing ``shape_ftp.main`` (``shape_ftp.py:1428-2039``,
SURVEY.md §3.2) with the TPU algorithm substitutions documented per-op:

  stage                       reference                    here
  -------------------------   --------------------------   ----------------------
  global shift                cv2.phaseCorrelate           ops.registration
  crop alignment              cv2.findTransformECC         ops.registration (ECC GN)
  demodulation                numpy FFT + loops            ftp.demod (jitted)
  reliable mask               cv2 morphology/CC            ops.morphology/components
  phase unwrap                serial heapq flood fill      ops.unwrap (WLS-DCT-PCG)
  detrend                     numpy lstsq IRLS             ops.polyfit
  tapers / distance fields    cv2.distanceTransform        ops.distance (JFA EDT)
  blob filter                 cv2.connectedComponents      ops.components
  mm conversion               scalar model zoo             calib.scalar_models

Geometry (fixed 3-point ROI circle) is resolved host-side so every array in
the graph has a static shape.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vistaf_tpu.calib import scalar_models
from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ftp.demod import ftp_complex_demod, ftp_complex_demod_pair
from vistaf_tpu.ops import geometry
from vistaf_tpu.ops.color import bgr_to_gray
from vistaf_tpu.ops.components import filter_components_by_peak, largest_component
from vistaf_tpu.ops.distance import (distance_transform_edt, erode_by_distance,
                                     get_distance_fn)
from vistaf_tpu.ops.filters import (box_filter, gaussian_blur, hanning_window,
                                    masked_gaussian_smooth)
from vistaf_tpu.ops.morphology import close as morph_close
from vistaf_tpu.ops.morphology import dilate, ellipse_kernel
from vistaf_tpu.ops.inpaint import inpaint_within_roi
from vistaf_tpu.ops.percentile import get_percentile_fn, masked_max
from vistaf_tpu.ops.polyfit import robust_polyfit2d
from vistaf_tpu.ops.registration import ecc_align, phase_correlate
from vistaf_tpu.ops.unwrap import unwrap_wls
from vistaf_tpu.ops.warp import (translate_bilinear, warp_affine_inverse_map,
                                 warp_affine_inverse_shear)


@dataclass(frozen=True)
class FTPGeometry:
    """Static crop/ROI geometry resolved from an FTPConfig on the host."""
    cx_full: int
    cy_full: int
    r_full: int
    bbox: tuple          # (x1, x2, y1, y2)
    cx_local: int
    cy_local: int
    r_local: int
    crop_h: int
    crop_w: int

    @staticmethod
    def from_config(cfg: FTPConfig) -> "FTPGeometry":
        cx, cy, r = geometry.circle_from_3_points(
            cfg.outer_circle_p1, cfg.outer_circle_p2, cfg.outer_circle_p3)
        bbox = geometry.roi_crop_bbox(cx, cy, r, cfg.image_height, cfg.image_width)
        cxl, cyl, rl = geometry.local_circle(cx, cy, r, bbox)
        x1, x2, y1, y2 = bbox
        return FTPGeometry(cx, cy, r, bbox, cxl, cyl, rl, y2 - y1, x2 - x1)


def detect_internal_holes(container: jnp.ndarray, known: jnp.ndarray,
                          ksize: int, frac_thr: float,
                          min_dist_edge_px: float,
                          metric: str = "chamfer3",
                          vpu: bool = False) -> jnp.ndarray:
    """``compute_internal_holes_within_mask`` (``shape_ftp.py:1153-1176``):
    unknown pixels inside ``container`` whose (k x k) neighborhood is mostly
    known (boxFilter count fraction >= frac_thr) and that sit at least
    ``min_dist_edge_px`` inside the container edge."""
    container = container.astype(bool)
    known = known.astype(bool) & container
    holes = container & ~known
    k = max(3, int(ksize) | 1)
    count_known = box_filter(known.astype(jnp.float32), k, vpu=vpu)
    count_cont = box_filter(container.astype(jnp.float32), k, vpu=vpu)
    frac = count_known / (count_cont + 1e-6)
    dist = get_distance_fn(metric)(container, max_dist=int(min_dist_edge_px) + 4)
    return holes & (frac >= float(frac_thr)) & (dist >= float(min_dist_edge_px))


def _smoothstep(t: jnp.ndarray) -> jnp.ndarray:
    t = jnp.clip(t, 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _curve01(t: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Frontier transition curves (``shape_ftp.py:1277-1284``)."""
    t = jnp.clip(t, 0.0, 1.0)
    if kind == "linear":
        return t
    if kind == "cosine":
        return 0.5 - 0.5 * jnp.cos(jnp.pi * t)
    return _smoothstep(t)


class FTPPipeline:
    """Host wrapper owning static geometry + calibration and the jitted core.

    Usage::

        pipe = FTPPipeline(cfg, p2h_model, use_negated_height)
        out = pipe(ref_bgr_u8, def_bgr_u8)   # dict of np arrays/scalars
    """

    def __init__(self, cfg: FTPConfig, p2h_model: Dict[str, Any],
                 use_negated_height: bool = True, debug_outputs: bool = False,
                 stop_after: Optional[str] = None):
        self.debug_outputs = debug_outputs
        # profiling aid: truncate the graph after a named stage
        # ('align' | 'demod' | 'reliable' | 'unwrap' | 'detrend' | 'assemble')
        self.stop_after = stop_after
        self.cfg = cfg
        self.geom = FTPGeometry.from_config(cfg)
        self.p2h_model = p2h_model
        self.use_neg = use_negated_height

        g = self.geom
        self._circ_mask = geometry.circular_mask(g.crop_h, g.crop_w, g.cx_local, g.cy_local, g.r_local)
        r_valid = max(0, g.r_local - int(cfg.roi_erode_px))
        self._roi_eroded = geometry.circular_mask(g.crop_h, g.crop_w, g.cx_local, g.cy_local, r_valid)
        self._apo = (geometry.circular_apodization(
            g.crop_h, g.crop_w, g.cx_local, g.cy_local, g.r_local, cfg.apod_taper_px)
            if cfg.use_circular_apodization else None)
        self._hann_full = hanning_window(cfg.image_height, cfg.image_width)
        gsd = int(cfg.global_shift_downsample)
        self._use_gsd = (gsd > 1 and min(cfg.image_height, cfg.image_width)
                         >= cfg.global_shift_downsample_min_px)
        if self._use_gsd:
            hh = (cfg.image_height // gsd) * gsd
            ww = (cfg.image_width // gsd) * gsd
            self._hann_pooled = hanning_window(hh // gsd, ww // gsd)
        # full-resolution phase-correlation window around the ROI bbox
        # (static coordinates; margin covers the sigma-7 blur reach so
        # crop-then-blur equals blur-then-crop on the window interior)
        gsw = int(cfg.global_shift_window_px)
        self._gsw_margin = 32
        self._use_gsw = (gsw > 0
                         and cfg.image_height >= gsw + 2 * self._gsw_margin
                         and cfg.image_width >= gsw + 2 * self._gsw_margin)
        if self._use_gsw:
            m = self._gsw_margin
            cyb = (g.bbox[2] + g.bbox[3]) // 2
            cxb = (g.bbox[0] + g.bbox[1]) // 2
            self._gsw_y0 = min(max(m, cyb - gsw // 2), cfg.image_height - gsw - m)
            self._gsw_x0 = min(max(m, cxb - gsw // 2), cfg.image_width - gsw - m)
            self._hann_win = hanning_window(gsw, gsw)

        self._forward = jax.jit(self._forward_impl)

    # ------------------------------------------------------------------
    def __call__(self, ref_bgr: np.ndarray, def_bgr: np.ndarray) -> Dict[str, Any]:
        out = self._forward(jnp.asarray(ref_bgr), jnp.asarray(def_bgr))
        res = {k: np.asarray(v) for k, v in out.items()}
        res["roi_eroded_crop"] = np.asarray(self._roi_eroded)
        res["circ_mask_crop"] = np.asarray(self._circ_mask)
        res["crop_bbox"] = self.geom.bbox
        res["estimated_grating_period_px"] = float(res.pop("est_period_px"))
        return res

    def forward_device(self, ref_bgr, def_bgr):
        """Raw jitted forward returning device arrays (for benchmarking /
        composition into larger graphs)."""
        return self._forward(ref_bgr, def_bgr)

    # ------------------------------------------------------------------
    def _reliable_mask(self, dref, ddef, roi, pctl):
        """compute_reliable_mask (``shape_ftp.py:739-775``): smoothed
        amplitude-product quality, p25 threshold inside the ROI, morph
        close, largest component, distance erode."""
        cfg = self.cfg
        quality = dref.amp * ddef.amp
        if cfg.quality_smooth_sigma_px > 0:
            quality = gaussian_blur(quality, cfg.quality_smooth_sigma_px,
                                    vpu=cfg.conv_vpu)
        amp_thr = pctl(quality, roi, cfg.amp_valid_percentile)
        reliable = roi & (quality >= amp_thr) & jnp.isfinite(quality)
        if cfg.valid_morph_close:
            ksz = max(3, cfg.valid_close_kernel | 1)
            reliable = morph_close(reliable, ellipse_kernel(ksz, ksz),
                                   iterations=cfg.valid_close_iters) & roi
        if cfg.reliable_keep_largest_cc:
            if cfg.largest_cc_method == "seed_edt":
                from vistaf_tpu.ops.components import dominant_component
                reliable = dominant_component(
                    reliable, seed_pool=int(cfg.cc_seed_pool)) & roi
            else:
                reliable = largest_component(reliable) & roi
        if cfg.reliable_edge_margin_px > 0:
            reliable = erode_by_distance(reliable, cfg.reliable_edge_margin_px,
                                         metric=cfg.distance_metric)
        return reliable, quality

    def _grating_band_prealign(self, ref_gray, def_gray, roi, apo, pctl):
        """USE_GRATING_PREALIGNMENT pass (``shape_ftp.py:1542-1616``).

        Pass-1 FTP demod of both frames -> pass-1 reliable mask -> alignment
        band = ROI pixels outside the (optionally dilated) reliable region
        within ``grating_prealign_band_px`` of its edge
        (``compute_between_roi_and_reliable_mask``, ``shape_ftp.py:778-795``)
        -> percentile-normalized highpass images (``highpass_to_u8``,
        ``shape_ftp.py:590-613``) -> masked ECC -> warp ``def_gray``.
        An empty alignment band keeps the identity warp (the reference
        skips; cv2 ECC would fail -> identity via our failure semantics).
        """
        cfg = self.cfg
        if cfg.lock_carrier_to_reference:
            dref1, ddef1 = ftp_complex_demod_pair(ref_gray, def_gray, apo, cfg)
        else:
            dref1 = ftp_complex_demod(ref_gray, apo, cfg, carrier_refined=None)
            ddef1 = ftp_complex_demod(def_gray, apo, cfg, carrier_refined=None)
        reliable1, _q1 = self._reliable_mask(dref1, ddef1, roi, pctl)

        rel = reliable1 & roi
        if cfg.grating_prealign_dilate_reliable_px > 0:
            d = int(cfg.grating_prealign_dilate_reliable_px)
            rel = dilate(rel, ellipse_kernel(2 * d + 1, 2 * d + 1)) & roi
        outside = roi & ~rel
        band = int(cfg.grating_prealign_band_px)
        if band > 0:
            dist = get_distance_fn(cfg.distance_metric)(~rel, max_dist=band + 4)
            dist_edge = jnp.maximum(dist - 1.0, 0.0)
            banded = outside & (dist_edge <= float(band))
            # reference guard (shape_ftp.py:787 `np.any(rel)`): with an empty
            # pass-1 reliable mask the distance field has no zero seeds, so
            # skip the band restriction and align over the whole outside-ROI
            # region instead of collapsing to an identity warp.
            outside = jnp.where(jnp.any(rel), banded, outside)
        align_mask = outside

        def highpass_norm(img):
            x = img.astype(jnp.float32)
            sig = float(cfg.grating_prealign_hp_sigma_px)
            hp = x - gaussian_blur(x, sig, vpu=cfg.conv_vpu) if sig > 0 else x
            p = pctl(hp, align_mask, (1.0, 99.0))
            p1, p99 = p[0], p[1]
            span = jnp.maximum(p99 - p1, 1e-6)
            u = jnp.clip((hp - p1) / span, 0.0, 1.0)
            # reference quantizes through uint8 before ECC
            return jnp.round(255.0 * u)

        hp_pair = jnp.stack([highpass_norm(ref_gray), highpass_norm(def_gray)]) / 255.0
        gf = float(cfg.grating_prealign_ecc_gauss_filt)
        if gf > 0:
            hp_pair = jax.vmap(lambda g: gaussian_blur(g, gf,
                                                       vpu=cfg.conv_vpu))(hp_pair)
        warp_g, _rho_g, _it_g = ecc_align(  # prealign shares the early-out knob
            hp_pair[0], hp_pair[1], align_mask,
            mode=cfg.grating_prealign_ecc_mode,
            max_iters=cfg.grating_prealign_ecc_iters,
            eps=cfg.grating_prealign_ecc_eps,
            stride=cfg.ecc_stride, sampler=cfg.ecc_sampler,
            shear_k=cfg.ecc_shear_k,
            stall_patience=cfg.ecc_stall_patience)
        identity = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        warp_g = jnp.where(jnp.any(align_mask), warp_g, identity)
        if cfg.ecc_sampler == "shear":
            return warp_affine_inverse_shear(def_gray, warp_g,
                                             K=cfg.ecc_shear_k, border="reflect")
        return warp_affine_inverse_map(def_gray, warp_g, border="reflect")

    def _forward_impl(self, ref_bgr: jnp.ndarray, def_bgr: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        g = self.geom
        x1, x2, y1, y2 = g.bbox
        pctl = get_percentile_fn(cfg.percentile_method)

        circ = jnp.asarray(self._circ_mask)
        roi = jnp.asarray(self._roi_eroded)
        apo = jnp.asarray(self._apo) if self._apo is not None else None

        gray_pair = jax.vmap(bgr_to_gray)(jnp.stack([ref_bgr, def_bgr]))
        ref_gray_full = gray_pair[0]
        def_gray_full = gray_pair[1]

        # --- global shift via windowed phase correlation (shape_ftp.py:1486-1492)
        gs_dx = jnp.float32(0.0)
        gs_dy = jnp.float32(0.0)
        if cfg.apply_global_shift and self._use_gsw:
            # full-resolution windowed correlation: blur only the window
            # (+margin so the interior matches the full-frame blur), then
            # correlate at native resolution — no spectrum decimation
            gsw = int(cfg.global_shift_window_px)
            m = self._gsw_margin
            y0, x0 = self._gsw_y0, self._gsw_x0
            sub = gray_pair[:, y0 - m:y0 + gsw + m, x0 - m:x0 + gsw + m]
            sub_b = jax.vmap(
                lambda g: gaussian_blur(g, cfg.global_shift_blur_sigma,
                                        vpu=cfg.conv_vpu))(sub)
            win = sub_b[:, m:m + gsw, m:m + gsw]
            dx, dy, _resp = phase_correlate(win[0], win[1],
                                            jnp.asarray(self._hann_win))
            gs_dx, gs_dy = dx, dy
            def_gray_full = translate_bilinear(def_gray_full, dx, dy,
                                               max_shift=cfg.global_shift_max_px)
        elif cfg.apply_global_shift:
            blur_pair = jax.vmap(
                lambda g: gaussian_blur(g, cfg.global_shift_blur_sigma,
                                        vpu=cfg.conv_vpu))(gray_pair)
            if self._use_gsd:
                # sigma-7 blurred inputs: the correlation peak is
                # pooling-invariant to <0.1 px at d=2, and the full-frame
                # FFT pair is the 10.7 ms 4K hot spot
                # (scripts/profile_align4k.py)
                gsd = int(cfg.global_shift_downsample)
                fh, fw = blur_pair.shape[1:]
                hh, ww = (fh // gsd) * gsd, (fw // gsd) * gsd
                pooled = blur_pair[:, :hh, :ww].reshape(
                    2, hh // gsd, gsd, ww // gsd, gsd).mean(axis=(2, 4))
                dx, dy, _resp = phase_correlate(
                    pooled[0], pooled[1], jnp.asarray(self._hann_pooled),
                    norm_eps=float(cfg.global_shift_pc_eps))
                dx = dx * float(gsd)
                dy = dy * float(gsd)
            else:
                dx, dy, _resp = phase_correlate(blur_pair[0], blur_pair[1],
                                                jnp.asarray(self._hann_full))
            gs_dx, gs_dy = dx, dy
            def_gray_full = translate_bilinear(def_gray_full, dx, dy,
                                               max_shift=cfg.global_shift_max_px)

        ref_gray = ref_gray_full[y1:y2, x1:x2]
        def_gray = def_gray_full[y1:y2, x1:x2]

        # --- ECC crop alignment (shape_ftp.py:1530-1537)
        ecc_warp = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
        ecc_rho = jnp.float32(jnp.nan)
        ecc_it = jnp.int32(0)
        if cfg.use_ecc_crop_alignment:
            crop01 = jnp.stack([ref_gray, def_gray]) / 255.0
            if cfg.ecc_gauss_filt and cfg.ecc_gauss_filt > 0:
                crop01 = jax.vmap(
                    lambda g: gaussian_blur(g, cfg.ecc_gauss_filt,
                                            vpu=cfg.conv_vpu))(crop01)
            # alignment is low-frequency (the crops are sigma-5 blurred
            # above): optionally estimate the warp on a 2x2-average-pooled
            # crop (d^2 less work per GN iteration at native 4K) and scale
            # the translations back up.  Only engages on large crops — the
            # bench-scale crop is already VMEM-fused.
            ds = int(cfg.ecc_downsample)
            use_ds = (ds > 1 and min(g.crop_h, g.crop_w) >= cfg.ecc_downsample_min_px)

            def _pool_crop(d):
                hh = (g.crop_h // d) * d
                ww = (g.crop_w // d) * d
                pooled = crop01[:, :hh, :ww].reshape(
                    2, hh // d, d, ww // d, d).mean(axis=(2, 4))
                circ_p = (circ[:hh, :ww].astype(jnp.float32).reshape(
                    hh // d, d, ww // d, d).mean(axis=(1, 3)) > 0.5)
                return pooled, circ_p, max(4, -(-cfg.ecc_shear_k // d))

            cds = int(cfg.ecc_coarse_downsample)
            use_c2f = (use_ds and int(cfg.ecc_polish_iters) > 0
                       and cds > ds and cfg.ecc_warp_mode == "euclidean")
            p_seed = None
            if use_c2f:
                # coarse descent on the cds grid; the basin is then polished
                # on the SAME ds grid the plain deploy solve used, so the
                # converged warp matches that preset's accuracy (the pure
                # cds solve alone was measured outside the 1% contract)
                pooled_c, circ_c, k_c = _pool_crop(cds)
                warp_c, _rho_c, _it_c = ecc_align(
                    pooled_c[0], pooled_c[1], circ_c, mode=cfg.ecc_warp_mode,
                    max_iters=cfg.ecc_iters, eps=cfg.ecc_eps,
                    stride=cfg.ecc_stride, sampler=cfg.ecc_sampler,
                    shear_k=k_c, stall_patience=cfg.ecc_stall_patience,
                    loop_kernel=False)
                theta_c = jnp.arctan2(warp_c[1, 0], warp_c[0, 0])
                p_seed = jnp.stack([theta_c,
                                    warp_c[0, 2] * (float(cds) / float(ds)),
                                    warp_c[1, 2] * (float(cds) / float(ds))])
            if use_ds:
                pooled, circ_p, shear_k_eff = _pool_crop(ds)
                ecc_in0, ecc_in1, ecc_mask = pooled[0], pooled[1], circ_p
            else:
                ecc_in0, ecc_in1, ecc_mask = crop01[0], crop01[1], circ
                shear_k_eff = cfg.ecc_shear_k
            warp, _rho, _it = ecc_align(ecc_in0, ecc_in1, ecc_mask,
                                        mode=cfg.ecc_warp_mode,
                                        max_iters=(int(cfg.ecc_polish_iters)
                                                   if use_c2f else cfg.ecc_iters),
                                        eps=cfg.ecc_eps,
                                        stride=cfg.ecc_stride,
                                        sampler=cfg.ecc_sampler,
                                        shear_k=shear_k_eff,
                                        stall_patience=cfg.ecc_stall_patience,
                                        loop_kernel=cfg.ecc_loop_kernel,
                                        p_init=p_seed)
            if use_ds:
                # rotation is scale-invariant; translations scale with ds
                warp = warp.at[:, 2].multiply(float(ds))
            ecc_warp = warp
            ecc_rho = _rho
            ecc_it = _it
            if cfg.ecc_sampler == "shear":
                # same small-warp regime as the GN loop: gather-free
                def_gray = warp_affine_inverse_shear(def_gray, warp,
                                                     K=cfg.ecc_shear_k,
                                                     border="reflect")
            else:
                def_gray = warp_affine_inverse_map(def_gray, warp, border="reflect")

        # --- grating-band prealignment (shape_ftp.py:1542-1616): pass-1
        # demod -> reliable mask -> ECC on highpassed gratings over the band
        # between the reliable region and the ROI, refining def_gray
        if cfg.use_grating_band_prealign:
            def_gray = self._grating_band_prealign(ref_gray, def_gray, roi, apo, pctl)

        if self.stop_after == 'align':
            return {'x': def_gray}

        # --- demodulation, carrier locked to the reference peak
        if cfg.lock_carrier_to_reference:
            dref, ddef = ftp_complex_demod_pair(ref_gray, def_gray, apo, cfg)
        else:
            dref = ftp_complex_demod(ref_gray, apo, cfg, carrier_refined=None)
            ddef = ftp_complex_demod(def_gray, apo, cfg, carrier_refined=None)

        hf, wf = dref.fft_shape
        h, w = ref_gray.shape

        if self.stop_after == 'demod':
            return {'x': jnp.abs(ddef.complex_demod) + dref.amp}

        # --- reliable mask (shape_ftp.py:739-775)
        reliable, quality = self._reliable_mask(dref, ddef, roi, pctl)

        if self.stop_after == 'reliable':
            return {'x': reliable.astype(jnp.float32) * quality}

        # --- wrapped phase difference + dk ramp (shape_ftp.py:1681-1689)
        ratio = ddef.complex_demod * jnp.conj(dref.complex_demod)
        dkx = ddef.k[0] - dref.k[0]
        dky = ddef.k[1] - dref.k[1]
        if cfg.apply_dk_ramp_correction and not cfg.lock_carrier_to_reference:
            yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            ramp = jnp.exp(1j * 2.0 * jnp.pi * (dkx * xx / wf + dky * yy / hf))
            ratio = ratio * ramp
        phase_wrapped = jnp.angle(ratio).astype(jnp.float32)

        # --- unwrap (WLS substitution for shape_ftp.py:1043-1080)
        uds = int(cfg.unwrap_downsample)
        use_uds = (uds > 1 and min(phase_wrapped.shape)
                   >= cfg.unwrap_downsample_min_px)
        if use_uds:
            # coarse-grid PCG + full-res congruence projection (the 4K
            # deploy path; the megakernel budget is crop-scale only)
            phase_unwrapped = unwrap_wls(phase_wrapped, reliable,
                                         cg_iters=cfg.unwrap_cg_iters,
                                         tol=cfg.unwrap_cg_tol,
                                         downsample=uds)
        elif cfg.unwrap_method == "wls_pallas":
            from vistaf_tpu.pallas.unwrap_kernel import unwrap_wls_pallas
            phase_unwrapped = unwrap_wls_pallas(phase_wrapped, reliable,
                                                cg_iters=cfg.unwrap_cg_iters,
                                                tol=cfg.unwrap_cg_tol)
        else:
            phase_unwrapped = unwrap_wls(phase_wrapped, reliable,
                                         cg_iters=cfg.unwrap_cg_iters,
                                         tol=cfg.unwrap_cg_tol)

        if self.stop_after == 'unwrap':
            return {'x': phase_unwrapped}

        # --- global plane removal (debug_ramp, shape_ftp.py:1417-1422);
        # with detrend_fold_plane the order-2 detrend basis absorbs it
        if cfg.remove_global_plane_before_detrend and not (
                cfg.detrend_fold_plane and cfg.use_two_pass_detrend
                and cfg.poly_order >= cfg.plane_order_for_removal):
            _, fit1 = robust_polyfit2d(phase_unwrapped, reliable,
                                       order=cfg.plane_order_for_removal,
                                       percentile_method=cfg.percentile_method,
                                       iters=cfg.polyfit_iters,
                                       resigma_iters=cfg.polyfit_resigma_iters,
                                       fused=cfg.polyfit_kernel)
            phase_unwrapped = phase_unwrapped - fit1

        # --- detrend (shape_ftp.py:1708-1751)
        if not cfg.use_two_pass_detrend:
            _, fit = robust_polyfit2d(phase_unwrapped, reliable, order=cfg.poly_order,
                                      percentile_method=cfg.percentile_method,
                                      iters=cfg.polyfit_iters,
                                      resigma_iters=cfg.polyfit_resigma_iters,
                                       fused=cfg.polyfit_kernel)
            phase_detrended = phase_unwrapped - fit
            bg_med = pctl(phase_detrended, reliable, 50.0)
            phase_zeroed = phase_detrended - bg_med
            contact_d = jnp.zeros_like(reliable)
        else:
            _, fit0 = robust_polyfit2d(phase_unwrapped, reliable, order=cfg.poly_order,
                                       percentile_method=cfg.percentile_method,
                                       iters=cfg.polyfit_iters,
                                       resigma_iters=cfg.polyfit_resigma_iters,
                                       fused=cfg.polyfit_kernel)
            abs_res = jnp.abs(phase_unwrapped - fit0)
            thrs = pctl(abs_res, reliable, (cfg.contact_percentile, 95.0, 98.0))
            thr, thr95, thr98 = thrs[0], thrs[1], thrs[2]
            contact = (abs_res >= thr) & reliable & jnp.isfinite(abs_res)
            frac = jnp.sum(contact) / jnp.maximum(jnp.sum(reliable), 1)
            thr2 = jnp.where(frac < cfg.min_contact_frac, thr95,
                             jnp.where(frac > cfg.max_contact_frac, thr98, thr))
            contact = (abs_res >= thr2) & reliable & jnp.isfinite(abs_res)
            contact_d = dilate(contact, ellipse_kernel(cfg.dilate_kernel_size, cfg.dilate_kernel_size),
                               iterations=cfg.dilate_iters) & reliable
            background = reliable & ~contact_d
            bg_small = jnp.sum(background) < 0.15 * jnp.sum(reliable)
            background = jnp.where(bg_small, reliable, background)
            _, fit = robust_polyfit2d(phase_unwrapped, background, order=cfg.poly_order,
                                      percentile_method=cfg.percentile_method,
                                      iters=cfg.polyfit_iters,
                                      resigma_iters=cfg.polyfit_resigma_iters,
                                       fused=cfg.polyfit_kernel)
            phase_detrended = phase_unwrapped - fit
            bg_med = pctl(phase_detrended, background, 50.0)
            phase_zeroed = phase_detrended - bg_med

        if self.stop_after == 'detrend':
            return {'x': phase_zeroed}

        height_map = phase_zeroed

        # --- reliable-only smoothing (shape_ftp.py:1755-1757)
        if cfg.reliable_smooth_sigma_px > 0:
            height_map = masked_gaussian_smooth(
                height_map, reliable & jnp.isfinite(height_map),
                cfg.reliable_smooth_sigma_px, vpu=cfg.conv_vpu)

        # --- auto sign flip (shape_ftp.py:1759-1768)
        if cfg.auto_flip_sign:
            core_thr = pctl(height_map, reliable, cfg.contact_core_percentile)
            core = reliable & jnp.isfinite(height_map) & (height_map <= core_thr)
            med_core = pctl(height_map, core, 50.0)
            flip = jnp.where(jnp.any(core) & (med_core > 0), -1.0, 1.0)
            height_map = height_map * flip

        known_height = reliable & jnp.isfinite(height_map)
        height_rel_filled = jnp.where(known_height, height_map, jnp.nan)

        # --- internal-hole detection + inpaint (shape_ftp.py:1153-1203,
        # 1776-1799).  Under the WLS unwrap every reliable pixel is finite,
        # so holes are empty in normal operation — but the machinery must
        # exist so injected NaNs heal as in the reference (SURVEY §5 fault
        # injection): boxFilter known-fraction >= hole_known_fraction,
        # interior-distance gate, diffusion fill clamped to the hole set.
        if cfg.fill_internal_holes_in_reliable:
            cand = detect_internal_holes(
                reliable, known_height, cfg.hole_neighborhood_px,
                cfg.hole_known_fraction, cfg.hole_min_dist_from_reliable_edge_px,
                metric=cfg.distance_metric, vpu=cfg.conv_vpu)
            med_known = pctl(height_map, known_height, 50.0)
            tmp = jnp.where(known_height, height_map, med_known)
            filled = inpaint_within_roi(tmp, reliable, cand,
                                        iters=cfg.inpaint_iters)
            height_rel_filled = jnp.where(cand & jnp.isfinite(filled),
                                          filled, height_rel_filled)

        output_reliable = reliable & jnp.isfinite(height_rel_filled)

        # --- frontier inside taper (shape_ftp.py:1803-1814)
        if cfg.frontier_zero_enable and cfg.frontier_zero_band_px > 0:
            rel = output_reliable
            dist_in = get_distance_fn(cfg.distance_metric)(rel, max_dist=cfg.frontier_zero_band_px + 4)
            dist_in_edge = jnp.maximum(dist_in - 1.0, 0.0)
            wgt = _curve01(dist_in_edge / max(1e-6, float(cfg.frontier_zero_band_px)),
                           cfg.frontier_zero_curve)
            base = cfg.unreliable_base_value
            inside = rel & jnp.isfinite(height_rel_filled)
            height_rel_filled = jnp.where(
                inside, base + (height_rel_filled - base) * wgt, height_rel_filled)

        # --- assemble final height (shape_ftp.py:1816-1824)
        height_final = jnp.where(roi, jnp.float32(cfg.unreliable_base_value), jnp.nan)
        height_final = jnp.where(output_reliable, height_rel_filled, height_final)

        if cfg.smooth_unreliable_region and cfg.unreliable_smooth_sigma_px > 0:
            smooth_all = masked_gaussian_smooth(height_final, roi,
                                                cfg.unreliable_smooth_sigma_px,
                                                vpu=cfg.conv_vpu)
            upd = roi & ~output_reliable
            height_final = jnp.where(upd, smooth_all, height_final)

        # --- frontier outside band -> base (shape_ftp.py:1826-1837)
        if cfg.frontier_zero_enable and cfg.frontier_zero_band_px > 0:
            dist_out = get_distance_fn(cfg.distance_metric)(
                ~output_reliable, max_dist=cfg.frontier_zero_band_px + 4)
            dist_out_edge = jnp.maximum(dist_out - 1.0, 0.0)
            outside_band = roi & ~output_reliable & (dist_out_edge <= float(cfg.frontier_zero_band_px))
            height_final = jnp.where(outside_band, jnp.float32(cfg.unreliable_base_value), height_final)

        # --- clamp positives (shape_ftp.py:1839-1841)
        if not cfg.allow_positive_deformation:
            clamp_sel = roi & jnp.isfinite(height_final)
            height_final = jnp.where(clamp_sel, jnp.minimum(height_final, 0.0), height_final)

        if self.stop_after == 'assemble':
            return {'x': height_final}

        # --- mm conversion (shape_ftp.py:1850-1855)
        height_out = height_final
        if cfg.output_height_in_mm:
            depth_mm = scalar_models.height_unitless_to_depth_mm(
                height_final, self.p2h_model, self.use_neg)
            height_out = -depth_mm if cfg.mm_keep_indentation_negative else depth_mm

        # --- contact blob filter (shape_ftp.py:1862-1873)
        contact_kept = jnp.zeros_like(roi)
        if cfg.filter_small_contact_blobs and cfg.output_height_in_mm:
            roi_f = roi & jnp.isfinite(height_out)
            depth = (-height_out if cfg.mm_keep_indentation_negative else height_out)
            cand = roi_f & (depth > cfg.contact_blob_cand_eps_mm)
            gmax = masked_max(depth, cand)
            thr = jnp.maximum(jnp.float32(cfg.contact_blob_min_peak_mm),
                              jnp.float32(cfg.contact_blob_min_peak_rel_frac) * gmax)
            kept = filter_components_by_peak(cand, depth, thr,
                                             min_area_px=cfg.contact_blob_min_area_px)
            removed = cand & ~kept
            height_out = jnp.where(removed, 0.0, height_out)
            contact_kept = kept

        # --- estimated grating period (shape_ftp.py:2015-2027)
        period_ref = wf / jnp.maximum(jnp.abs(dref.k[0]), 1e-9)
        period_def = wf / jnp.maximum(jnp.abs(ddef.k[0]), 1e-9)
        est_period = 0.5 * (period_ref + period_def)

        out = {
            "height_map_mm_crop": height_out.astype(jnp.float32),
            "height_map_unitless_crop": height_final.astype(jnp.float32),
            "output_reliable_crop": output_reliable,
            "reliable_crop": reliable,
            "contact_dilated_crop": contact_d,
            "contact_kept_crop": contact_kept,
            "est_period_px": est_period,
            "carrier_k_ref": dref.k,
            "carrier_k_def": ddef.k,
            "phase_wrapped_crop": phase_wrapped,
        }
        if self.debug_outputs:
            out.update({
                "dbg_def_gray_aligned": def_gray,
                "dbg_ref_gray": ref_gray,
                "dbg_quality": quality,
                "dbg_amp_ref": dref.amp,
                "dbg_amp_def": ddef.amp,
                "dbg_unwrapped": phase_unwrapped,
                "dbg_phase_zeroed": phase_zeroed,
                # angle/amp pairs instead of raw complex: complex host
                # fetches hit backend UNIMPLEMENTED on tunneled platforms
                "dbg_ecc_warp": ecc_warp,
                "dbg_ecc_rho": ecc_rho,
                "dbg_ecc_iters": ecc_it,
                "dbg_global_shift": jnp.stack([gs_dx, gs_dy]),
                "dbg_phase_ref": jnp.angle(dref.complex_demod).astype(jnp.float32),
                "dbg_phase_def": jnp.angle(ddef.complex_demod).astype(jnp.float32),
                "dbg_i_norm_ref": dref.i_norm,
                "dbg_i_norm_def": ddef.i_norm,
                "dbg_peak_ref": dref.peak_f,
            })
        return out

"""Force sensing: frame pair -> FTP mm heightmap -> volume -> Newtons.

TPU counterpart of ``force_sensor.py`` (single-shot) and the per-image core
of ``height_to_force.py``.  Volume integration is one fused masked reduction
(``force_sensor.py:93-123``); the force model evaluates from the loaded
``calibration_model.json`` (``force_sensor.py:129-167``).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vistaf_tpu.calib import artifacts, scalar_models
from vistaf_tpu.config import ForceConfig, FTPConfig
from vistaf_tpu.ftp.pipeline import FTPPipeline


def depth_map_reductions(height_map_mm: jnp.ndarray, roi_mask: jnp.ndarray,
                         depth_eps_mm: float = 0.01):
    """The px-area-independent reductions of the volume integrator: returns
    (depth_sum_mm, contact_px, max_depth_mm, any_contact).

    Split out so evidence harnesses can fetch four scalars per frame and
    apply the f32 px-area scaling host-side (``host_volume_from_reductions``)
    with bit-identical results — full-map fetches over the dev tunnel were
    ~99% of the corpus wall time (docs/PERF.md round 5).
    """
    Z = height_map_mm.astype(jnp.float32)
    roi = roi_mask
    Zf = jnp.where(jnp.isfinite(Z), Z, 0.0)
    pos = jnp.clip(Zf, 0.0, jnp.inf)
    neg = jnp.clip(-Zf, 0.0, jnp.inf)
    pos_sum = jnp.sum(jnp.where(roi, pos, 0.0))
    neg_sum = jnp.sum(jnp.where(roi, neg, 0.0))
    depth = jnp.where(neg_sum > pos_sum, neg, pos)
    depth = jnp.where(roi, depth, 0.0)

    contact = depth > depth_eps_mm
    depth_sum = jnp.sum(jnp.where(contact, depth, 0.0))
    contact_px = jnp.sum(contact.astype(jnp.float32))
    max_depth = jnp.max(jnp.where(contact, depth, 0.0))
    return depth_sum, contact_px, max_depth, jnp.any(contact)


def depth_map_to_volume_cm3(height_map_mm: jnp.ndarray, roi_mask: jnp.ndarray,
                            mm_per_px, depth_eps_mm: float = 0.01):
    """V = sum(depth * px_area) over depth > eps within ROI; returns
    (volume_cm3, contact_area_mm2, max_depth_mm).

    Depth sign is auto-detected: whichever of (+Z, -Z) integrates larger is
    the indentation side (``force_sensor.py:106-108``).
    """
    depth_sum, contact_px, max_depth, any_contact = depth_map_reductions(
        height_map_mm, roi_mask, depth_eps_mm)
    px_area = jnp.asarray(mm_per_px, jnp.float32) ** 2
    volume_mm3 = depth_sum * px_area
    area_mm2 = contact_px * px_area
    volume_cm3 = jnp.where(any_contact, volume_mm3 / 1000.0, 0.0)
    area_mm2 = jnp.where(any_contact, area_mm2, 0.0)
    max_depth = jnp.where(any_contact, max_depth, 0.0)
    return volume_cm3, area_mm2, max_depth


def host_volume_from_reductions(depth_sum, contact_px, max_depth, mm_per_px):
    """Host-side tail of ``depth_map_to_volume_cm3`` over fetched reduction
    scalars, replicating the device tail's f32 arithmetic op for op (f32
    square, f32 products, f32 /1000) — the scaling itself is bit-faithful;
    any difference vs a full-map run comes from the reductions fusing into
    the forward graph (<= ~2e-7 relative, measured).  Returns (volume_cm3,
    contact_area_mm2, max_depth_mm) as python floats."""
    px_area = np.float32(mm_per_px) ** 2
    volume_mm3 = np.float32(depth_sum) * px_area
    area_mm2 = np.float32(contact_px) * px_area
    if not (np.float32(contact_px) > 0):
        return 0.0, 0.0, 0.0
    return (float(volume_mm3 / np.float32(1000.0)), float(area_mm2),
            float(np.float32(max_depth)))


class ForcePipeline:
    """frame pair -> {height_mm, volume_cm3, contact_area_mm2, max_depth_mm,
    force_N, mm_per_px}.

    Mirrors ``force_sensor.main`` (``force_sensor.py:193-305``) minus the
    file I/O, which lives in ``vistaf_tpu.runner``.
    """

    def __init__(self, ftp_cfg: FTPConfig, force_cfg: ForceConfig,
                 p2h_model: Dict[str, Any], force_model: Dict[str, Any],
                 use_negated_height: bool = True, debug_outputs: bool = False):
        self.ftp = FTPPipeline(ftp_cfg, p2h_model, use_negated_height,
                               debug_outputs=debug_outputs)
        self.force_cfg = force_cfg
        self.force_model = force_model

    @classmethod
    def from_artifacts(cls, data_root: str, ftp_cfg: Optional[FTPConfig] = None,
                       force_cfg: Optional[ForceConfig] = None,
                       debug_outputs: bool = False) -> "ForcePipeline":
        import os
        from vistaf_tpu import config as C
        ftp_cfg = ftp_cfg or FTPConfig()
        force_cfg = force_cfg or ForceConfig()
        p2h, use_neg = artifacts.load_phase_to_height(os.path.join(data_root, C.PHASE_TO_HEIGHT_JSON))
        fc = artifacts.load_force_calibration(os.path.join(data_root, C.HEIGHT_TO_FORCE_JSON))
        return cls(ftp_cfg, force_cfg, p2h, fc["best_model"], use_neg,
                   debug_outputs=debug_outputs)

    def mm_per_px(self, est_period_px: float) -> float:
        """Grating pitch / FFT-estimated period (``force_sensor.py:173-187``)."""
        if self.force_cfg.override_mm_per_px is not None:
            return float(self.force_cfg.override_mm_per_px)
        if est_period_px is None or not np.isfinite(est_period_px) or est_period_px <= 1e-12:
            raise RuntimeError(f"Invalid estimated_grating_period_px={est_period_px}")
        return float(self.force_cfg.grating_pitch_mm) / float(est_period_px)

    def __call__(self, ref_bgr: np.ndarray, def_bgr: np.ndarray,
                 roi_from_finite: bool = False) -> Dict[str, Any]:
        """Run FTP + volume + force.

        ``roi_from_finite`` selects the multimodal orchestrator's ROI
        convention (isfinite(height), ``multimodal_sensor.py:388``) instead of
        the force sensor's eroded-circle ROI.
        """
        res = self.ftp(ref_bgr, def_bgr)
        height_mm = res["height_map_mm_crop"]
        roi = np.isfinite(height_mm) if roi_from_finite else res["roi_eroded_crop"]
        mm_per_px = self.mm_per_px(res["estimated_grating_period_px"])

        v, a, d = depth_map_to_volume_cm3(
            jnp.asarray(height_mm), jnp.asarray(roi), mm_per_px,
            self.force_cfg.depth_eps_mm)
        force_n = scalar_models.predict_force_from_volume(self.force_model, float(v), xp=np)

        res.update({
            "volume_cm3": float(v),
            "contact_area_mm2": float(a),
            "max_depth_mm": float(d),
            "force_N": float(force_n),
            "mm_per_px": mm_per_px,
        })
        return res

    # ------------------------------------------------------------------
    # BASELINE configs 2/3 surfaces
    # ------------------------------------------------------------------
    def contact_classification_device(self):
        """BASELINE config 2: full preprocessing chain -> per-taxel contact
        classification, as one jittable device function.

        The FTP registration/normalization stages ARE the preprocessing
        chain (global-shift rectification + crop + illumination normalize),
        and the per-pixel depth > eps decision is the per-taxel contact
        classifier the reference's volume integration thresholds on
        (``force_sensor.py:93-123``).  Returns
        (contact_mask bool (crop_h, crop_w), contact_area_mm2, depth_mm)."""
        eps = self.force_cfg.depth_eps_mm
        pitch = self.force_cfg.grating_pitch_mm
        override = self.force_cfg.override_mm_per_px

        def fn(ref_bgr, def_bgr):
            out = self.ftp._forward_impl(ref_bgr, def_bgr)
            height = out["height_map_mm_crop"]
            roi = jnp.isfinite(height)
            mm_per_px = (jnp.float32(override) if override is not None
                         else pitch / jnp.maximum(out["est_period_px"], 1e-12))
            Zf = jnp.where(roi, jnp.where(jnp.isfinite(height), height, 0.0), 0.0)
            pos = jnp.clip(Zf, 0.0, jnp.inf)
            neg = jnp.clip(-Zf, 0.0, jnp.inf)
            depth = jnp.where(jnp.sum(neg) > jnp.sum(pos), neg, pos)
            contact = depth > eps
            area = jnp.sum(contact.astype(jnp.float32)) * mm_per_px ** 2
            return contact, area, depth

        return fn

    def force_map_device(self):
        """BASELINE config 3: dense displacement field -> normal-force map.

        The FTP phase-difference field is the dense out-of-plane
        displacement field (the reference has no marker array; the printed
        grating is the dense "marker" whose demodulated phase shift is the
        displacement observable).  The calibrated model is a scalar
        volume->force law, so the per-pixel normal-force map distributes
        the calibrated total over the contact patch in proportion to each
        taxel's indentation volume — a decomposition that sums exactly to
        the scalar output.

        3-axis shear is explicitly ABSENT: the reference estimates normal
        force only (``force_sensor.py:193-305``; no shear model exists
        anywhere in the reference), and a single-direction grating gives
        one in-plane phase observable, not a 3-axis decomposition — the
        rigid in-plane component is already reported via the ECC warp.
        Returns (force_map_N (crop_h, crop_w), displacement_mm, force_N).
        """
        eps = self.force_cfg.depth_eps_mm
        pitch = self.force_cfg.grating_pitch_mm
        override = self.force_cfg.override_mm_per_px
        model = self.force_model

        def fn(ref_bgr, def_bgr):
            out = self.ftp._forward_impl(ref_bgr, def_bgr)
            height = out["height_map_mm_crop"]
            roi = jnp.isfinite(height)
            mm_per_px = (jnp.float32(override) if override is not None
                         else pitch / jnp.maximum(out["est_period_px"], 1e-12))
            v, _a, _d = depth_map_to_volume_cm3(height, roi, mm_per_px, eps)
            force_n = scalar_models.predict_force_from_volume(model, v, xp=jnp)
            Zf = jnp.where(roi, jnp.where(jnp.isfinite(height), height, 0.0), 0.0)
            pos = jnp.clip(Zf, 0.0, jnp.inf)
            neg = jnp.clip(-Zf, 0.0, jnp.inf)
            depth = jnp.where(jnp.sum(neg) > jnp.sum(pos), neg, pos)
            depth = jnp.where(depth > eps, depth, 0.0)
            vol_px = depth * mm_per_px ** 2 / 1000.0          # cm^3 per px
            total = jnp.maximum(jnp.sum(vol_px), 1e-12)
            force_map = force_n * vol_px / total
            return force_map, Zf, force_n

        return fn

    # ------------------------------------------------------------------
    # Evidence-harness surface: scalar-only fetch
    # ------------------------------------------------------------------
    def evidence_reductions_device(self, roi_from_finite: bool = False):
        """One jittable step returning ONLY the four volume-integrator
        reductions + the estimated grating period — four scalars per frame
        instead of the full map dict.  The goldens/corpus harnesses feed
        these to ``host_volume_from_reductions`` (an op-for-op f32 replica
        of the device tail; fusing the reductions into the forward graph
        moves values by <= ~2e-7 relative — measured over the 75-sphere
        corpus); fetching the maps per frame over the dev tunnel was
        ~5.6 s/frame against 36 ms of device compute (docs/PERF.md r05)."""
        eps = self.force_cfg.depth_eps_mm

        roi_eroded = None if roi_from_finite else jnp.asarray(self.ftp._roi_eroded)

        def fn(ref_bgr, def_bgr):
            out = self.ftp._forward_impl(ref_bgr, def_bgr)
            height = out["height_map_mm_crop"]
            roi = jnp.isfinite(height) if roi_from_finite else roi_eroded
            s, n, d, _any = depth_map_reductions(height, roi, eps)
            return s, n, d, out["est_period_px"]

        return fn

    def evidence_scalars(self, ref_dev, def_dev, jfn) -> Dict[str, float]:
        """Host tail for ``evidence_reductions_device``: returns the same
        scalar fields ``__call__`` reports (volume/area/max-depth/force/
        mm_per_px/period), from a scalar-only fetch."""
        s, n, d, period = (float(x) for x in jax.device_get(jfn(ref_dev, def_dev)))
        mm = self.mm_per_px(period)
        mm32 = np.float32(mm)
        v, a, dmax = host_volume_from_reductions(s, n, d, mm32)
        force_n = scalar_models.predict_force_from_volume(self.force_model, v, xp=np)
        return {"volume_cm3": v, "contact_area_mm2": a, "max_depth_mm": dmax,
                "force_N": float(force_n), "mm_per_px": mm,
                "estimated_grating_period_px": period}

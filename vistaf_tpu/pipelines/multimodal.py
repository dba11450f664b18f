"""Multimodal sensing: one frame pair -> force + shape + temperature.

Compute core of ``multimodal_sensor.main`` (``multimodal_sensor.py:349-697``)
without the monkeypatching: the force and temperature pipelines are explicit
objects sharing the deformed frame; session-directory I/O lives in
``vistaf_tpu.runner``.

Two execution shapes:

- ``__call__`` runs the two modality graphs sequentially (two jit calls,
  two def-frame uploads) — the reference-shaped path every golden was
  validated on.
- ``step_fused`` jits BOTH forwards as ONE graph: the 24 MB deformed frame
  is uploaded once, XLA schedules the two modality subgraphs in one launch
  sequence, and the volume/force reduction runs in-graph so a streaming
  caller can fetch five scalars instead of two 4K maps.  Same math, same
  configs — the subgraphs are the exact ``_forward_impl`` functions the
  sequential path jits.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vistaf_tpu.calib import scalar_models
from vistaf_tpu.config import ForceConfig, FTPConfig, TempConfig
from vistaf_tpu.pipelines.force import ForcePipeline, depth_map_to_volume_cm3
from vistaf_tpu.temperature.inference import TemperaturePipeline


class MultimodalPipeline:
    def __init__(self, force: ForcePipeline, temperature: TemperaturePipeline):
        self.force = force
        self.temperature = temperature
        self._fused_forward = jax.jit(self._fused_impl)

    @classmethod
    def from_artifacts(cls, data_root: str,
                       ftp_cfg: Optional[FTPConfig] = None,
                       force_cfg: Optional[ForceConfig] = None,
                       temp_cfg: Optional[TempConfig] = None) -> "MultimodalPipeline":
        return cls(
            ForcePipeline.from_artifacts(data_root, ftp_cfg, force_cfg),
            TemperaturePipeline.from_artifacts(data_root, temp_cfg),
        )

    @staticmethod
    def ingest(frame) -> jax.Array:
        """Upload a frame once; pass the result to ``__call__`` /
        ``step_fused`` so the sequential path's two modality graphs share
        ONE host->device transfer (a numpy frame would be re-uploaded by
        each jit call — the 24 MB transfer is the dominant per-frame cost
        when frames arrive from a camera)."""
        return jax.device_put(jnp.asarray(frame))

    def __call__(self, ref_bgr, def_bgr) -> Dict[str, Any]:
        # force path uses the orchestrator's ROI convention: finite heightmap
        # cells (multimodal_sensor.py:388).  Accepts numpy frames or
        # device arrays from ``ingest`` (then the deformed frame crosses
        # the host link once even though two graphs read it).
        def_bgr = jnp.asarray(def_bgr)
        force_out = self.force(ref_bgr, def_bgr, roi_from_finite=True)
        temp_out = self.temperature(def_bgr)

        tmap = temp_out["temperature_map_final"]
        troi = temp_out["roi_outer"] if self.temperature.cfg.crop_output_to_outer_roi \
            else temp_out["roi_full"]
        valid = troi & np.isfinite(tmap)
        if valid.any():
            vals = tmap[valid]
            tstats = {
                "mean_C": float(vals.mean()),
                "median_C": float(np.median(vals)),
                "std_C": float(vals.std()),
                "min_C": float(vals.min()),
                "max_C": float(vals.max()),
                "valid_pixels": int(valid.sum()),
            }
        else:
            tstats = {k: float("nan") for k in ("mean_C", "median_C", "std_C", "min_C", "max_C")}
            tstats["valid_pixels"] = 0

        return {
            "force": force_out,
            "temperature": temp_out,
            "temperature_stats": tstats,
        }

    # ------------------------------------------------------------------
    def _fused_impl(self, ref_bgr: jnp.ndarray, def_bgr: jnp.ndarray):
        """Both modality forwards traced into one graph.

        The force ROI follows the orchestrator convention
        (isfinite(height), ``multimodal_sensor.py:388``) and the
        volume->force reduction runs on-device so ``fetch='scalars'``
        never moves a map over the host link."""
        fout = self.force.ftp._forward_impl(ref_bgr, def_bgr)
        tout = self.temperature._forward_impl(def_bgr)

        height = fout["height_map_mm_crop"]
        roi = jnp.isfinite(height)
        fcfg = self.force.force_cfg
        if fcfg.override_mm_per_px is not None:
            mm_per_px = jnp.float32(fcfg.override_mm_per_px)
        else:
            mm_per_px = (jnp.float32(fcfg.grating_pitch_mm)
                         / jnp.maximum(fout["est_period_px"], 1e-12))
        v, a, d = depth_map_to_volume_cm3(height, roi, mm_per_px,
                                          fcfg.depth_eps_mm)
        force_n = scalar_models.predict_force_from_volume(
            self.force.force_model, v, xp=jnp)
        scalars = {
            "volume_cm3": v,
            "contact_area_mm2": a,
            "max_depth_mm": d,
            "force_N": force_n,
            "mm_per_px": mm_per_px,
            # temperature scalar stats are already reduced in-graph by the
            # temperature forward (t_mean/t_min/t_max/t_std/valid_pixels)
        }
        return fout, tout, scalars

    def step_fused(self, ref_bgr: np.ndarray, def_bgr: np.ndarray,
                   fetch: str = "maps") -> Dict[str, Any]:
        """One-launch multimodal step.

        ``fetch='maps'`` returns the same contract as ``__call__`` (both
        full output dicts + temperature_stats); ``fetch='scalars'`` fetches
        only the in-graph reductions — force/volume/area/depth plus the
        temperature stats — for streaming callers.
        """
        fout, tout, scal = self._fused_forward(jnp.asarray(ref_bgr),
                                               jnp.asarray(def_bgr))
        if fetch == "scalars":
            res = {k: float(np.asarray(v)) for k, v in scal.items()}
            for k in ("t_mean", "t_min", "t_max", "t_std"):
                res[k + "_C"] = float(np.asarray(tout[k]))
            res["valid_pixels"] = int(np.asarray(tout["valid_pixels"]))
            res["estimated_grating_period_px"] = float(
                np.asarray(fout["est_period_px"]))
            return res

        # maps: materialize the sequential path's full contract
        force_out = {k: np.asarray(v) for k, v in fout.items()}
        force_out["roi_eroded_crop"] = np.asarray(self.force.ftp._roi_eroded)
        force_out["circ_mask_crop"] = np.asarray(self.force.ftp._circ_mask)
        force_out["crop_bbox"] = self.force.ftp.geom.bbox
        force_out["estimated_grating_period_px"] = float(
            force_out.pop("est_period_px"))
        for k, v in scal.items():
            force_out[k] = float(np.asarray(v))

        temp_out = {k: np.asarray(v) for k, v in tout.items()}
        temp_out["roi_full"] = np.asarray(self.temperature._roi_full)
        temp_out["roi_outer"] = np.asarray(self.temperature._roi_outer)
        temp_out["crop_bbox"] = self.temperature._crop_bbox

        tmap = temp_out["temperature_map_final"]
        troi = temp_out["roi_outer"] if self.temperature.cfg.crop_output_to_outer_roi \
            else temp_out["roi_full"]
        valid = troi & np.isfinite(tmap)
        if valid.any():
            vals = tmap[valid]
            tstats = {
                "mean_C": float(vals.mean()),
                "median_C": float(np.median(vals)),
                "std_C": float(vals.std()),
                "min_C": float(vals.min()),
                "max_C": float(vals.max()),
                "valid_pixels": int(valid.sum()),
            }
        else:
            tstats = {k: float("nan") for k in ("mean_C", "median_C", "std_C", "min_C", "max_C")}
            tstats["valid_pixels"] = 0
        return {
            "force": force_out,
            "temperature": temp_out,
            "temperature_stats": tstats,
        }

"""Multimodal sensing: one frame pair -> force + shape + temperature.

Compute core of ``multimodal_sensor.main`` (``multimodal_sensor.py:349-697``)
without the monkeypatching: the force and temperature pipelines are explicit
objects sharing the deformed frame; session-directory I/O lives in
``vistaf_tpu.runner``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from vistaf_tpu.config import ForceConfig, FTPConfig, TempConfig
from vistaf_tpu.pipelines.force import ForcePipeline
from vistaf_tpu.temperature.inference import TemperaturePipeline


class MultimodalPipeline:
    def __init__(self, force: ForcePipeline, temperature: TemperaturePipeline):
        self.force = force
        self.temperature = temperature

    @classmethod
    def from_artifacts(cls, data_root: str,
                       ftp_cfg: Optional[FTPConfig] = None,
                       force_cfg: Optional[ForceConfig] = None,
                       temp_cfg: Optional[TempConfig] = None) -> "MultimodalPipeline":
        return cls(
            ForcePipeline.from_artifacts(data_root, ftp_cfg, force_cfg),
            TemperaturePipeline.from_artifacts(data_root, temp_cfg),
        )

    def __call__(self, ref_bgr: np.ndarray, def_bgr: np.ndarray) -> Dict[str, Any]:
        # force path uses the orchestrator's ROI convention: finite heightmap
        # cells (multimodal_sensor.py:388)
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

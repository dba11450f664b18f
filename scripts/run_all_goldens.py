"""Run the force path on all 5 demo scenes and compare to Demos_report."""
import os
import sys
import time
import json

os.environ.setdefault("VISTAF_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = os.environ["VISTAF_PLATFORM"]
import jax
jax.config.update("jax_platforms", os.environ["VISTAF_PLATFORM"])

import numpy as np
import cv2

sys.path.insert(0, "/root/repo")
from vistaf_tpu.pipelines.force import ForcePipeline

REF = "/root/reference"
SCENES = ["FINAL_E_deformed", "FINAL_F_deformed", "FINAL_P_deformed",
          "FINAL_ROUND_METAL", "FINAL_TEMP_DEMO"]

pipe = ForcePipeline.from_artifacts(REF)
ref = cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg", cv2.IMREAD_COLOR)

rows = []
for scene in SCENES:
    d = cv2.imread(f"{REF}/Final_demos_images/{scene}.jpg", cv2.IMREAD_COLOR)
    t0 = time.time()
    out = pipe(ref, d, roi_from_finite=True)
    dt = time.time() - t0
    g = json.load(open(f"{REF}/Multimodal_Sensor/Demos_report/{scene}/force_sensing/result.json"))
    rows.append((scene, out, g, dt))
    print(f"{scene:22s} F={out['force_N']:8.4f} (gold {g['force_N']:8.4f}, "
          f"{100*(out['force_N']-g['force_N'])/max(g['force_N'],1e-9):+6.2f}%)  "
          f"V={out['volume_cm3']:.6f} (gold {g['volume_cm3']:.6f})  "
          f"maxD={out['max_depth_mm']:.4f} (gold {g['max_depth_mm']:.4f})  [{dt:.0f}s]")

"""One-off: FINAL_F + FINAL_E goldens with contact_blob_cand_eps_mm=0.0
(the literal reference blob-candidate rule, shape_ftp.py:1234) vs the
pinned-topology floor, to decide the config default (ADVICE r2 medium)."""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()

import cv2

from vistaf_tpu.config import FTPConfig
from vistaf_tpu.pipelines.force import ForcePipeline

REF = "/root/reference"
ref = cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg", cv2.IMREAD_COLOR)

out = {}
for eps in (0.0, 1e-2):
    pipe = ForcePipeline.from_artifacts(
        REF, ftp_cfg=FTPConfig(contact_blob_cand_eps_mm=eps))
    for scene in ("FINAL_F_deformed", "FINAL_E_deformed"):
        d = cv2.imread(f"{REF}/Final_demos_images/{scene}.jpg", cv2.IMREAD_COLOR)
        t0 = time.time()
        r = pipe(ref, d, roi_from_finite=True)
        g = json.load(open(f"{REF}/Multimodal_Sensor/Demos_report/{scene}/"
                           "force_sensing/result.json"))
        dpct = 100 * (r["force_N"] - g["force_N"]) / g["force_N"]
        print(f"eps={eps:g} {scene}: F={r['force_N']:.4f} "
              f"(gold {g['force_N']:.4f}, {dpct:+.2f}%) V={r['volume_cm3']:.6f} "
              f"[{time.time()-t0:.0f}s]", flush=True)
        out[f"{scene}_eps{eps:g}"] = {"force_N": float(r["force_N"]),
                                      "gold": g["force_N"], "dpct": float(dpct)}

with open("/tmp/eps0_check.json", "w") as f:
    json.dump(out, f, indent=1)

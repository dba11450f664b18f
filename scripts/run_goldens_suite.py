"""Full golden-suite evidence run: force on all 5 demo scenes + temperature
on every scene with a committed golden, against the reference's
``Multimodal_Sensor/Demos_report`` outputs.  Writes one JSON artifact
(commit as ``GOLDENS_r{N}.json``) so parity claims are reproducible.

Usage: python scripts/run_goldens_suite.py [out.json] [parity|deploy]
(runs on the machine's default platform — the real TPU chip under axon)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vistaf_tpu.utils.jaxcache import enable as _enable

_enable()

import numpy as np

REF = "/root/reference"
SCENES = ["FINAL_E_deformed", "FINAL_F_deformed", "FINAL_P_deformed",
          "FINAL_ROUND_METAL", "FINAL_TEMP_DEMO"]


def main():
    import cv2
    import jax

    from vistaf_tpu.config import FTPConfig, TempConfig
    from vistaf_tpu.pipelines.force import ForcePipeline
    from vistaf_tpu.temperature.inference import TemperaturePipeline

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/goldens_suite.json"
    mode = sys.argv[2] if len(sys.argv) > 2 else "parity"
    ftp_cfg = FTPConfig().deploy() if mode == "deploy" else None
    temp_cfg = TempConfig().deploy() if mode == "deploy" else None

    force_pipe = ForcePipeline.from_artifacts(REF, ftp_cfg=ftp_cfg)
    temp_pipe = TemperaturePipeline.from_artifacts(REF, cfg=temp_cfg)
    ref_img = cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg",
                         cv2.IMREAD_COLOR)

    # scalar-only fetches (bit-identical values — see ForcePipeline.
    # evidence_scalars / TemperaturePipeline.stats): the full-map dict cost
    # multiple seconds per scene over the dev tunnel
    import jax.numpy as jnp
    jforce = jax.jit(force_pipe.evidence_reductions_device(roi_from_finite=True))
    ref_dev = jax.device_put(jnp.asarray(ref_img))

    result = {"mode": mode, "platform": jax.devices()[0].platform,
              "force": {}, "temperature": {}}
    t_all = time.time()
    for scene in SCENES:
        img = cv2.imread(f"{REF}/Final_demos_images/{scene}.jpg", cv2.IMREAD_COLOR)
        gold_f = json.load(open(
            f"{REF}/Multimodal_Sensor/Demos_report/{scene}/force_sensing/result.json"))
        t0 = time.time()
        out = force_pipe.evidence_scalars(ref_dev, jnp.asarray(img), jforce)
        dt = time.time() - t0
        row = {
            "force_N": float(out["force_N"]), "gold_force_N": gold_f["force_N"],
            "dforce_pct": float((out["force_N"] - gold_f["force_N"])
                                / max(gold_f["force_N"], 1e-9) * 100.0),
            "volume_cm3": float(out["volume_cm3"]),
            "gold_volume_cm3": gold_f["volume_cm3"],
            "dvol_pct": float((out["volume_cm3"] - gold_f["volume_cm3"])
                              / max(gold_f["volume_cm3"], 1e-9) * 100.0),
            "max_depth_mm": float(out["max_depth_mm"]),
            "gold_max_depth_mm": gold_f["max_depth_mm"],
            "wall_s": round(dt, 1),
        }
        result["force"][scene] = row
        print(f"force {scene:22s} F={row['force_N']:8.4f} "
              f"(gold {row['gold_force_N']:8.4f}, {row['dforce_pct']:+6.2f}%) "
              f"[{dt:.0f}s]", flush=True)

        mm_path = (f"{REF}/Multimodal_Sensor/Demos_report/{scene}/"
                   "combined_outputs/multimodal_summary.json")
        if os.path.exists(mm_path):
            g = json.load(open(mm_path))["sensor_readings"]["temperature"]
            t0 = time.time()
            t_out = temp_pipe.stats(img)
            dt = time.time() - t0
            trow = {
                "mean_C": float(t_out["t_mean"]), "gold_mean_C": g["mean_C"],
                "dmean_C": float(t_out["t_mean"] - g["mean_C"]),
                "max_C": float(t_out["t_max"]), "gold_max_C": g["max_C"],
                "dmax_C": float(t_out["t_max"] - g["max_C"]),
                "valid_pixels": int(t_out["valid_pixels"]),
                "gold_valid_pixels": int(g["valid_pixels"]),
                "wall_s": round(dt, 1),
            }
            result["temperature"][scene] = trow
            print(f"temp  {scene:22s} mean={trow['mean_C']:6.2f} "
                  f"(gold {trow['gold_mean_C']:6.2f}) max={trow['max_C']:6.2f} "
                  f"(gold {trow['gold_max_C']:6.2f}) [{dt:.0f}s]", flush=True)

    df = [abs(r["dforce_pct"]) for r in result["force"].values()]
    dm = [abs(r["dmean_C"]) for r in result["temperature"].values()]
    result["summary"] = {
        "max_abs_dforce_pct": float(np.max(df)),
        "max_abs_temp_dmean_C": float(np.max(dm)) if dm else None,
        "wall_s_total": round(time.time() - t_all, 1),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["summary"]))


if __name__ == "__main__":
    main()

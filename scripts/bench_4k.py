"""Native-4K (3840x2160) frame->force steady-state latency on one TPU chip.

Measures the parity and deploy presets on the FINAL_E demo pair with the
same fetch-based timing as ``bench.py`` (compile excluded), checks the
predicted force against the committed reference output (3.296 N,
``Multimodal_Sensor/Demos_report/FINAL_E_deformed/force_sensing/result.json``),
then records a per-scene deploy p50 for ALL five golden scenes — the
ECC-failure scenes (ROUND_METAL, TEMP_DEMO; ``shape_ftp.py:576-578``
semantics) run a different ECC iteration profile than FINAL_E and need
their own latency evidence.  Writes the summary JSON artifact.

Usage: python scripts/bench_4k.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vistaf_tpu.utils.jaxcache import enable as _enable

_enable()

REF = "/root/reference"
GOLD_FORCE_N = 3.296


def main():
    import cv2

    import bench
    from vistaf_tpu.config import FTPConfig

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_4k.json"
    ref = cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg", cv2.IMREAD_COLOR)
    de = cv2.imread(f"{REF}/Final_demos_images/FINAL_E_deformed.jpg", cv2.IMREAD_COLOR)

    results = {}
    for mode in ("deploy", "parity"):
        cfg = FTPConfig().deploy() if mode == "deploy" else FTPConfig()
        t0 = time.time()
        fps, p50_ms, force = bench.measure_tpu(cfg, ref, de, iters=4, rounds=3)
        wall = time.time() - t0
        err_pct = (force - GOLD_FORCE_N) / GOLD_FORCE_N * 100.0
        results[mode] = {
            "p50_ms": round(p50_ms, 2),
            "fps": round(fps, 2),
            "force_N": round(force, 4),
            "force_err_vs_gold_pct": round(err_pct, 3),
            "wall_s_incl_compile": round(wall, 1),
            **bench.measure_tpu.last_stats,
        }
        print(f"{mode:8s} p50={p50_ms:8.2f} ms  fps={fps:6.2f}  "
              f"force={force:.4f} N ({err_pct:+.2f}% vs gold)  "
              f"[wall {wall:.0f}s]", flush=True)

    # per-scene deploy p50 (same compiled graph — only the frame changes)
    cfg = FTPConfig().deploy()
    scenes = ["FINAL_E_deformed", "FINAL_F_deformed", "FINAL_P_deformed",
              "FINAL_ROUND_METAL", "FINAL_TEMP_DEMO"]
    per_scene = {}
    for scene in scenes:
        de_s = cv2.imread(f"{REF}/Final_demos_images/{scene}.jpg",
                          cv2.IMREAD_COLOR)
        fps, p50_ms, force = bench.measure_tpu(cfg, ref, de_s, iters=4,
                                               rounds=3)
        per_scene[scene] = {"p50_ms": round(p50_ms, 2),
                            "fps": round(fps, 2),
                            "force_N": round(force, 4),
                            **bench.measure_tpu.last_stats}
        print(f"deploy {scene:20s} p50={p50_ms:7.2f} ms  fps={fps:6.2f}  "
              f"force={force:.4f} N", flush=True)

    summary = {"scene": "FINAL_E_deformed", "resolution": "3840x2160",
               "gold_force_N": GOLD_FORCE_N, **results,
               "per_scene_deploy": per_scene}
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

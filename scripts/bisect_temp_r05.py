"""Temperature-4K deploy knob bisect (round 5): inpaint iteration budget.

profile_temp_r05.py attribution of the 21.3 ms deploy step: segmentation
11.9, wide inpaint (48 it) 4.6, color inpaint (24 it) 2.4, oriented blur
0.7, fused poly kernel 0.4 ms.  The two diffusion inpaints are the largest
non-segmentation costs and are HBM-bound (1 px/iteration relaxation), so
this script measures the accuracy frontier of cutting their budgets on ALL
five golden scenes (the r4 force-path precedent: inpaint 64 -> 20 after the
same bisection) plus the per-config step p50 on TEMP_DEMO.

Gates (deploy contract, tests/test_corpus_regression.py): |dmean| <= 0.1 C,
|dmax| <= 0.75 C per scene vs the reference goldens.

Usage: python scripts/bisect_temp_r05.py [config ...]
Configs: base w32c16 w24c12 (default: all three).
"""
import json
import sys
import time

sys.path.insert(0, '/root/repo')
from vistaf_tpu.utils.jaxcache import enable as _enable

_enable()

import cv2
import jax
import jax.numpy as jnp
import numpy as np

REF = '/root/reference'
SCENES = ["FINAL_E_deformed", "FINAL_F_deformed", "FINAL_P_deformed",
          "FINAL_ROUND_METAL", "FINAL_TEMP_DEMO"]

CONFIGS = {
    "base": {},
    "w32c16": {"wide_inpaint_iters": 32, "color_inpaint_iters": 16},
    "w24c12": {"wide_inpaint_iters": 24, "color_inpaint_iters": 12},
    # fill-radius floor probe: the widest wide-domain holes are the
    # sat_dilate_ksize=13 specks (~7 px to their centers), so 16 iters is
    # ~2.3x the fill radius — the same margin the force path's
    # inpaint_iters=20 cut used (docs/PERF.md r05)
    "w16c8": {"wide_inpaint_iters": 16, "color_inpaint_iters": 8},
}


def p50_step(pipe, frame, iters=40, rounds=3):
    if pipe._stats_forward is None:
        pipe.stats(frame)
    jf = pipe._stats_forward
    fd = jax.device_put(jnp.asarray(frame))
    out = jf(fd)
    jax.block_until_ready(out["t_mean"])
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jf(fd)
        _ = float(o["t_mean"])
        per.append((time.perf_counter() - t0) / iters)
    return float(np.percentile(per, 50)) * 1e3


def main():
    from vistaf_tpu.config import TempConfig
    from vistaf_tpu.temperature.inference import TemperaturePipeline

    names = sys.argv[1:] or list(CONFIGS)
    frames = {s: cv2.imread(f"{REF}/Final_demos_images/{s}.jpg", cv2.IMREAD_COLOR)
              for s in SCENES}
    golds = {}
    for s in SCENES:
        g = json.load(open(f"{REF}/Multimodal_Sensor/Demos_report/{s}/"
                           "combined_outputs/multimodal_summary.json"))
        golds[s] = g["sensor_readings"]["temperature"]

    results = {}
    for name in names:
        cfg = TempConfig().deploy().replace(**CONFIGS[name])
        pipe = TemperaturePipeline.from_artifacts(REF, cfg)
        rows = {}
        for s in SCENES:
            st = pipe.stats(frames[s])
            rows[s] = {
                "dmean_C": float(st["t_mean"]) - golds[s]["mean_C"],
                "dmax_C": float(st["t_max"]) - golds[s]["max_C"],
                "valid_pixels": int(st["valid_pixels"]),
            }
            print(f"{name:8s} {s:22s} dmean {rows[s]['dmean_C']:+.4f} C "
                  f"dmax {rows[s]['dmax_C']:+.4f} C", flush=True)
        ms = p50_step(pipe, frames["FINAL_TEMP_DEMO"])
        worst_mean = max(abs(r["dmean_C"]) for r in rows.values())
        worst_max = max(abs(r["dmax_C"]) for r in rows.values())
        ok = worst_mean <= 0.1 and worst_max <= 0.75
        results[name] = {"p50_ms": round(ms, 2), "worst_abs_dmean_C": worst_mean,
                         "worst_abs_dmax_C": worst_max, "in_contract": ok,
                         "rows": rows}
        print(f"{name:8s} p50 {ms:.2f} ms  worst |dmean| {worst_mean:.4f} "
              f"worst |dmax| {worst_max:.4f}  {'OK' if ok else 'OUT OF CONTRACT'}",
              flush=True)

    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "rows"}
                      for k, v in results.items()}, indent=1))
    with open("/tmp/bisect_temp_r05.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

"""Per-knob attribution of a golden-scene force move for the round-5 deploy
knobs (global_shift_window_px / ecc_polish_iters / cc_seed_pool).

Runs the deploy force path on one scene with each knob toggled off the full
deploy preset (and a base with all three off), printing force_N and the
delta vs the committed golden.

Usage: python scripts/bisect_r05_knobs.py [scene] [variant ...]
Variants: base gsw c2f pool all (default: all of them)
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()

import cv2
import numpy as np

from vistaf_tpu.config import FTPConfig
from vistaf_tpu.pipelines.force import ForcePipeline

REF = '/root/reference'

_OFF = {"global_shift_window_px": 0, "ecc_polish_iters": 0, "cc_seed_pool": 1}
VARIANTS = {
    "base": _OFF,                                      # r04 deploy behavior
    "gsw": {**_OFF, "global_shift_window_px": 2048},
    "c2f": {**_OFF, "ecc_polish_iters": 10},
    "pool": {**_OFF, "cc_seed_pool": 4},
    "all": {},                                         # full r05 deploy
    # pooled phase correlation with the regularized normalization (the r3
    # incident's root cause addressed); deploy + this knob
    "gsd_eps": {"global_shift_downsample": 2, "global_shift_pc_eps": 1e-3},
    "gsd_eps4": {"global_shift_downsample": 2, "global_shift_pc_eps": 1e-4},
    # deploy inpaint budget: the XLA relaxation loop is 4.3 ms/pair at 64
    # iters and the glare holes are <=10 px wide
    "inp20": {"inpaint_iters": 20},
    "inp32": {"inpaint_iters": 32},
}


def main():
    scene = sys.argv[1] if len(sys.argv) > 1 else 'FINAL_TEMP_DEMO'
    args = sys.argv[2:]
    timing = "--time" in args
    names = [a for a in args if not a.startswith("--")] or list(VARIANTS)
    ref = cv2.imread(f'{REF}/Final_demos_images/FINAL_reference.jpg',
                     cv2.IMREAD_COLOR)
    de = cv2.imread(f'{REF}/Final_demos_images/{scene}.jpg', cv2.IMREAD_COLOR)
    gold = json.load(open(f'{REF}/Multimodal_Sensor/Demos_report/{scene}/'
                          'force_sensing/result.json'))
    gF = float(gold['force_N'])
    for name in names:
        over = VARIANTS[name]
        cfg = FTPConfig().deploy().replace(**over)
        if timing:
            import bench
            fps, p50, F = bench.measure_tpu(cfg, ref, de, iters=4, rounds=3)
            print(f"{name:6s} F={F:.6f}  d={100*(F-gF)/gF:+.3f}%  "
                  f"p50={p50:7.2f} ms", flush=True)
            continue
        pipe = ForcePipeline.from_artifacts(REF, ftp_cfg=cfg)
        t0 = time.time()
        out = pipe(ref, de, roi_from_finite=True)
        F = float(out['force_N'])
        print(f"{name:6s} F={F:.6f}  d={100*(F-gF)/gF:+.3f}%  "
              f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()

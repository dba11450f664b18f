"""Run the full 75-sphere calibration corpus (``height_to_force.py:360-442``)
through the TPU force pipeline and compare per-image volumes against the
reference's committed ``per_image_results.csv``.

Usage: python scripts/run_sphere_corpus.py [parity|deploy] [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vistaf_tpu.utils.jaxcache import enable as _enable

_enable()

import numpy as np


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from vistaf_tpu.calib import artifacts
    from vistaf_tpu.config import FTPConfig
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.pipelines.force import (depth_map_reductions,
                                            host_volume_from_reductions)

    REF = "/root/reference"
    mode = sys.argv[1] if len(sys.argv) > 1 else "parity"
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/sphere_corpus_{mode}.json"

    cfg = FTPConfig().deploy() if mode == "deploy" else FTPConfig()
    p2h, use_neg = artifacts.load_phase_to_height(
        f"{REF}/Force/Phase_to_height/calibration_out/calibration_model.json")
    pipe = FTPPipeline(cfg, p2h, use_neg)
    ref_img = cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg", cv2.IMREAD_COLOR)

    # scalar-fetch evidence step: full FTP forward + the px-area-independent
    # volume reductions in ONE graph, four scalars back per frame.  The
    # host f32 tail replicates the old full-map-fetch runner's arithmetic;
    # fusing the reductions into the forward graph moves 40/75 deploy rows
    # by <= 2.4e-7 relative (f32 fusion dust, measured vs CORPUS_r05) while
    # cutting the fetch cost from ~5 s/frame over the dev tunnel.
    roi_eroded = jnp.asarray(pipe._roi_eroded)

    def _step(ref_bgr, def_bgr):
        out = pipe._forward_impl(ref_bgr, def_bgr)
        h = out["height_map_mm_crop"]
        s, n, d, _any = depth_map_reductions(h, roi_eroded, 0.01)
        return s, n, d, out["est_period_px"]

    jstep = jax.jit(_step)
    ref_dev = jax.device_put(jnp.asarray(ref_img))

    gold = {}
    import csv
    with open(f"{REF}/Force/Height_to_force/calibration_out/per_image_results.csv") as f:
        for row in csv.DictReader(f):
            gold[row["file"]] = row

    rows = []
    t_start = time.time()
    t_first = None
    t_decode = 0.0
    for i in range(1, 76):
        fname = f"sphere-{i}.jpg"
        t0 = time.time()
        img = cv2.imread(f"{REF}/Force/Height_to_force/Loading/{fname}", cv2.IMREAD_COLOR)
        t_decode += time.time() - t0
        t0 = time.time()
        s, n, d, period = (float(x) for x in
                           jax.device_get(jstep(ref_dev, jnp.asarray(img))))
        if t_first is None:
            t_first = time.time() - t0
        mm_per_px = 2.0 / period
        v, a, d = host_volume_from_reductions(s, n, d, np.float32(mm_per_px))
        g = gold[fname]
        gv = float(g["volume_cm3"])
        dv = (float(v) - gv) / max(gv, 1e-12) * 100.0
        rows.append({
            "file": fname, "force_N": float(g["force_N"]),
            "volume_cm3": float(v), "gold_volume_cm3": gv, "dvol_pct": dv,
            "contact_area_mm2": float(a), "max_depth_mm": float(d),
            "mm_per_px": mm_per_px,
        })
        print(f"{fname:16s} F={g['force_N']:>5s}N V={float(v):.6f} "
              f"(gold {gv:.6f}, {dv:+6.2f}%)", flush=True)

    dv = np.array([r["dvol_pct"] for r in rows])
    summary = {
        "mode": mode,
        "n": len(rows),
        "median_abs_dvol_pct": float(np.median(np.abs(dv))),
        "p90_abs_dvol_pct": float(np.percentile(np.abs(dv), 90)),
        "max_abs_dvol_pct": float(np.max(np.abs(dv))),
        "wall_s": time.time() - t_start,
        "first_step_s": round(t_first, 1),        # compile / cache load
        "decode_s_total": round(t_decode, 1),     # host cv2.imread, 1 CPU
        "rows": rows,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"\nmedian |dV| = {summary['median_abs_dvol_pct']:.3f}%  "
          f"p90 = {summary['p90_abs_dvol_pct']:.3f}%  "
          f"max = {summary['max_abs_dvol_pct']:.3f}%  [{summary['wall_s']:.0f}s]")

    # re-fit the volume->force model from OUR volumes (height_to_force.py
    # fit with origin anchoring x20) and compare constants
    from vistaf_tpu.calib import fitting
    from vistaf_tpu.trainers.height_to_force import MODEL_CANDIDATES
    vols = np.array([r["volume_cm3"] for r in rows])
    forces = np.array([r["force_N"] for r in rows])
    V_fit = np.concatenate([np.zeros(20), vols])
    F_fit = np.concatenate([np.zeros(20), forces])
    best, _ = fitting.fit_best_model(V_fit, F_fit, MODEL_CANDIDATES)
    print("refit best model:", best["type"], best["params"],
          "rmse", round(best["rmse"], 4))
    summary["refit_best"] = {"type": best["type"], "params": best["params"],
                             "rmse": float(best["rmse"])}
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()

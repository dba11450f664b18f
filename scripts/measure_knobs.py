"""Measure the round-3 staged megakernels on the real chip in one run.

Bench-scale (640x480) deploy p50 for each whole-solver megakernel and
their combination.  The chip is reached through a high-RTT tunnel, so a
handful of dispatches is NOT enough to time anything: executions overlap
the final fetch's round trip and the measured delta collapses to ~0.
Each rep therefore dispatches ``iters`` (default 2000) forwards before
one scalar fetch, so device time dominates the RTT by >100x.

Writes JSON (default KNOBS_r03.json).  (The 4K-only ecc_downsample knob
is measured by scripts/bench_4k.py with FTPConfig.ecc_downsample=2 — it
never engages at bench scale.)

Usage: python scripts/measure_knobs.py [out.json] [iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()

import numpy as np

H, W = 480, 640

# The measured baseline here is FTPConfig.deploy() WITHOUT the three
# megakernels (they are deploy defaults since this measurement landed);
# each variant then adds kernels on top of that base.
_BASE_OFF = {"unwrap_method": "wls", "ecc_loop_kernel": False,
             "polyfit_kernel": False}
VARIANTS = {
    "deploy-base": {},
    "+unwrap_pallas": {"unwrap_method": "wls_pallas"},
    "+ecc_loop": {"ecc_loop_kernel": True},
    "+polyfit_kernel": {"polyfit_kernel": True},
    "+unwrap+polyfit": {"unwrap_method": "wls_pallas", "polyfit_kernel": True},
    "all3 (deploy default)": {"unwrap_method": "wls_pallas",
                              "ecc_loop_kernel": True,
                              "polyfit_kernel": True},
}


def main():
    import jax
    import jax.numpy as jnp
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    out_path = sys.argv[1] if len(sys.argv) > 1 else "KNOBS_r03.json"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    x = jax.device_put(np.float32(1.0)); _ = float(x)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); _ = float(x + 1); ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts))
    res = {"rtt_ms": round(rtt * 1e3, 2), "iters_per_rep": iters,
           "platform": jax.devices()[0].platform}
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    base = scaled_ftp_config(H, W).deploy().replace(**_BASE_OFF)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, base)
    r = jax.device_put(np.asarray(ref))
    d = jax.device_put(np.asarray(de))

    vol_ref = None
    for name, kw in VARIANTS.items():
        cfg = base.replace(**kw)
        pipe = FTPPipeline(cfg, p2h)
        o = pipe._forward(r, d)
        _ = float(o["est_period_px"])  # warm fetch / compile
        hm = np.asarray(o["height_map_mm_crop"])
        vol = float(np.nansum(np.maximum(hm, 0)))
        per = []
        for _ in range(3):
            t0 = time.perf_counter()
            oo = None
            for _ in range(iters):
                oo = pipe._forward(r, d)
            _ = float(oo["est_period_px"])
            per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
        p50 = float(np.median(per))
        if vol_ref is None:
            vol_ref = vol
        dv = (vol - vol_ref) / max(abs(vol_ref), 1e-9)
        res[name] = {"p50_ms": round(p50 * 1e3, 3),
                     "fps": round(1.0 / p50, 1),
                     "dvolume_vs_base_pct": round(100 * dv, 4)}
        print(f"{name:24s} p50 {p50*1e3:7.3f} ms  ({1/p50:6.1f} fps)  "
              f"dV {100*dv:+.4f}%", flush=True)
        with open(out_path, "w") as fj:
            json.dump(res, fj, indent=1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

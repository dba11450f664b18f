"""Measure the round-3 opt-in knobs on the real chip in one run.

Bench-scale (640x480) deploy p50 for each staged megakernel and their
combination, timed with the fetch-isolated method of bench.py.  Writes
JSON.  (The 4K-only ecc_downsample knob is measured by scripts/
bench_4k.py with FTPConfig.ecc_downsample=2 — it never engages at bench
scale.)

Usage: python scripts/measure_knobs.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()

import numpy as np

from bench_streams import _rtt  # shared fetch-RTT helper

H, W = 480, 640


def main():
    import jax
    import jax.numpy as jnp
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    out_path = sys.argv[1] if len(sys.argv) > 1 else "KNOBS_r03.json"
    rtt = _rtt(jax, jnp)
    res = {"rtt_ms": round(rtt * 1e3, 2)}
    print(f"rtt {rtt*1e3:.1f} ms", flush=True)

    base = scaled_ftp_config(H, W).deploy()
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, base)
    r = jax.device_put(np.asarray(ref))
    d = jax.device_put(np.asarray(de))

    variants = {
        "deploy": {},
        "deploy+unwrap_pallas": {"unwrap_method": "wls_pallas"},
        "deploy+ecc_loop": {"ecc_loop_kernel": True},
        "deploy+polyfit_kernel": {"polyfit_kernel": True},
        "deploy+all3": {"unwrap_method": "wls_pallas", "ecc_loop_kernel": True,
                        "polyfit_kernel": True},
    }
    force_ref = None
    for name, kw in variants.items():
        cfg = base.replace(**kw)
        pipe = FTPPipeline(cfg, p2h)
        o = pipe._forward(r, d)
        f0 = float(o["est_period_px"])  # warm fetch
        hm = np.asarray(o["height_map_mm_crop"])
        vol = float(np.nansum(np.maximum(hm, 0)))
        per = []
        for _ in range(5):
            t0 = time.perf_counter()
            oo = None
            for _ in range(30):
                oo = pipe._forward(r, d)
            _ = float(oo["est_period_px"])
            per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / 30)
        p50 = float(np.percentile(per, 50))
        if force_ref is None:
            force_ref = vol
        dv = (vol - force_ref) / max(abs(force_ref), 1e-9)
        res[name] = {"p50_ms": round(p50 * 1e3, 3),
                     "fps": round(1.0 / p50, 1),
                     "dvolume_vs_deploy_pct": round(100 * dv, 4)}
        print(f"{name:24s} p50 {p50*1e3:7.3f} ms  ({1/p50:6.1f} fps)  "
              f"dV {100*dv:+.4f}%", flush=True)
        with open(out_path, "w") as fj:
            json.dump(res, fj, indent=1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()

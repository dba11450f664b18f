"""BASELINE configs 2 and 3 benchmark rows.

config 2: full preprocessing chain -> per-taxel contact classification
  (``ForcePipeline.contact_classification_device``) — the FTP
  registration/normalization stages are the preprocessing chain and the
  depth>eps decision is the per-taxel classifier.
config 3: dense displacement field -> normal-force map
  (``ForcePipeline.force_map_device``) — the demodulated grating phase is
  the dense displacement field; the calibrated scalar is distributed over
  the contact patch by per-taxel indentation volume.  3-axis shear is a
  documented NON-GOAL: the reference estimates normal force only
  (``force_sensor.py:193-305``).

Measures steady-state p50 at 640x480 (deploy preset, same scale as
bench.py) with the fetch-isolated enqueue-N-then-fetch discipline.

Usage: python scripts/bench_config23.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()

import numpy as np

H, W = 480, 640


def measure(jfn, args, iters=200, rounds=5, rtt=0.0):
    import jax
    outs = jfn(*args)
    jax.block_until_ready(outs)
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        o = None
        for _ in range(iters):
            o = jfn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[-1])
        per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
    return float(np.percentile(per, 50)) * 1e3


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else 'BENCH_CONFIG23_r05.json'
    import cv2
    import jax
    import jax.numpy as jnp
    from vistaf_tpu.config import ForceConfig
    from vistaf_tpu.pipelines.force import ForcePipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config

    REF = '/root/reference'
    cfg = scaled_ftp_config(H, W).deploy()
    p2h = {"type": "hinge_saturating",
           "params": {"a": 2.0826494996246554, "b": 4.20441143052732,
                      "c": -1.767844217125454e-09}}
    fm = {"type": "growth",
          "params": {"a": 1.6197727931063521, "b": 9.756634595755994}}
    pipe = ForcePipeline(cfg, ForceConfig(), p2h, fm)
    ref = cv2.resize(cv2.imread(f'{REF}/Final_demos_images/FINAL_reference.jpg',
                                cv2.IMREAD_COLOR), (W, H),
                     interpolation=cv2.INTER_AREA)
    de = cv2.resize(cv2.imread(f'{REF}/Final_demos_images/FINAL_E_deformed.jpg',
                               cv2.IMREAD_COLOR), (W, H),
                    interpolation=cv2.INTER_AREA)
    r = jax.device_put(np.asarray(ref))
    d = jax.device_put(np.asarray(de))

    triv = jax.jit(lambda x: x + 1.0)
    _ = float(triv(jnp.float32(1.0)))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(triv(jnp.float32(1.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    c2 = jax.jit(pipe.contact_classification_device())
    c3 = jax.jit(pipe.force_map_device())

    p50_c2 = measure(c2, (r, d), rtt=rtt)
    p50_c3 = measure(c3, (r, d), rtt=rtt)
    contact, area, _depth = c2(r, d)
    fmap, _disp, force_n = c3(r, d)

    res = {
        "resolution": f"{W}x{H}",
        "preset": "deploy",
        "config2_contact_classification": {
            "p50_ms": round(p50_c2, 3),
            "fps": round(1000.0 / p50_c2, 1),
            "n_contact_taxels": int(np.asarray(contact).sum()),
            "contact_area_mm2": float(area),
        },
        "config3_force_map": {
            "p50_ms": round(p50_c3, 3),
            "fps": round(1000.0 / p50_c3, 1),
            "force_map_sum_N": float(np.asarray(fmap).sum()),
            "force_N": float(force_n),
            "shear_note": ("3-axis shear is a documented non-goal: the "
                           "reference's physics is normal-force only "
                           "(force_sensor.py:193-305)"),
        },
        "rtt_ms": round(rtt * 1e3, 2),
    }
    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Prefix-timing of the native-4K force pipeline on the real chip.

Same fetch-isolated discipline as profile_temp4k.py: each prefix graph
(FTPPipeline stop_after=...) is timed by in-graph repetition so the 24 MB
frame crosses the tunnel once per measurement.  Usage:
    python scripts/profile_force4k.py [deploy|parity]
"""
import sys, time
sys.path.insert(0, '/root/repo')
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()
import cv2
import jax, jax.numpy as jnp, numpy as np

from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ftp.pipeline import FTPPipeline

REF = "/root/reference/Final_demos_images/FINAL_reference.jpg"
DEF = "/root/reference/Final_demos_images/FINAL_E_deformed.jpg"
STAGES = ['align', 'demod', 'reliable', 'unwrap', 'detrend', 'assemble', None]
P2H = {"type": "hinge_saturating",
       "params": {"a": 2.0826540593, "b": 4.2044134334, "c": 0.0}}


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "deploy"
    cfg = FTPConfig().deploy() if mode == "deploy" else FTPConfig()
    ref = cv2.imread(REF, cv2.IMREAD_COLOR)
    de = cv2.imread(DEF, cv2.IMREAD_COLOR)

    triv = jax.jit(lambda x: x + 1.0); _ = float(triv(jnp.float32(1.0)))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter(); _ = float(triv(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts))
    print(f"mode={mode} rtt={rtt*1e3:.1f} ms", flush=True)

    r = jax.device_put(np.asarray(ref))
    d = jax.device_put(np.asarray(de))
    prev = 0.0
    for stage in STAGES:
        pipe = FTPPipeline(cfg, P2H, stop_after=stage)
        out = pipe._forward(r, d)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = np.asarray(leaf).ravel()[0]          # warm + fetch barrier
        n = 3 if stage in (None, 'assemble', 'detrend', 'unwrap') else 5
        per = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = pipe._forward(r, d)
            _ = np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0]
            per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / n)
        dt = float(np.percentile(per, 50)) * 1e3
        print(f"through {str(stage):10s}: {dt:9.2f} ms  (+{dt-prev:8.2f})", flush=True)
        prev = dt


if __name__ == "__main__":
    main()

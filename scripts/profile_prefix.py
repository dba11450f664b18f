"""Prefix-timing of the full fused pipeline graph at bench scale."""
import os, sys, time
sys.path.insert(0,'/root/repo')
import jax, jax.numpy as jnp, numpy as np
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

H, W = 480, 640
cfg = scaled_ftp_config(H, W).replace(percentile_method="hist")
p2h = {"type":"hinge_saturating","params":{"a":2.08,"b":4.2,"c":0.0}}
ref, de = synthetic_pair(H, W, cfg)
r = jnp.asarray(ref); d = jnp.asarray(de)

prev = 0.0
for stage in ['align','demod','reliable','unwrap','detrend','assemble',None]:
    pipe = FTPPipeline(cfg, p2h, stop_after=stage)
    f = pipe._forward
    out = f(r, d); jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(r, d)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/n*1000
    print(f"through {str(stage):10s}: {dt:8.2f} ms  (+{dt-prev:7.2f})", flush=True)
    prev = dt

"""Honest feature-ablation timing of the full deploy pipeline at bench scale.

block_until_ready can return before compute finishes on tunneled TPU
platforms, so timing is fetch-based (same technique as bench.py): enqueue N
executions on the in-order device queue, fetch a scalar once, subtract the
separately measured fetch RTT.
"""
import os, sys, time
sys.path.insert(0, '/root/repo')
import jax, jax.numpy as jnp, numpy as np
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.pipelines.force import depth_map_to_volume_cm3
from vistaf_tpu.calib import scalar_models
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair
from vistaf_tpu.utils.jaxcache import enable as _cache
_cache()

H, W = 480, 640
base = scaled_ftp_config(H, W).deploy()
p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
fm = {"type": "growth", "params": {"a": 1.62, "b": 9.76}}
ref, de = synthetic_pair(H, W, base)
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
print(f"rtt {rtt*1e3:.2f} ms", flush=True)


def run(name, cfg, n=40, rounds=3):
    pipe = FTPPipeline(cfg, p2h)

    def fn(rr, dd):
        res = pipe._forward_impl(rr, dd)
        height = res["height_map_mm_crop"]
        roi = jnp.isfinite(height)
        mm_per_px = 2.0 / jnp.maximum(res["est_period_px"], 1e-9)
        v, a, _dd = depth_map_to_volume_cm3(height, roi, mm_per_px, 0.01)
        return scalar_models.predict_force_from_volume(fm, v)

    jfn = jax.jit(fn)
    _ = float(jfn(r, d))
    best = 1e9
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = jfn(r, d)
        _ = float(out)
        best = min(best, (time.perf_counter() - t0 - rtt) / n)
    print(f"{name:36s} {best*1e3:8.3f} ms", flush=True)
    return best * 1e3


run("deploy baseline", base)
run("no ECC", base.replace(use_ecc_crop_alignment=False))
run("ecc_iters=25", base.replace(ecc_iters=25))
run("no largest CC", base.replace(reliable_keep_largest_cc=False))
run("no blob filter", base.replace(filter_small_contact_blobs=False))
run("no frontier", base.replace(frontier_zero_enable=False))
run("no bad pixel", base.replace(bad_pixel_enable=False))
run("unwrap cg=6", base.replace(unwrap_cg_iters=6))
run("no global shift", base.replace(apply_global_shift=False))
run("no edge margin (EDT)", base.replace(reliable_edge_margin_px=0))
run("all-off", base.replace(use_ecc_crop_alignment=False,
                            reliable_keep_largest_cc=False,
                            filter_small_contact_blobs=False,
                            frontier_zero_enable=False,
                            bad_pixel_enable=False,
                            unwrap_cg_iters=6,
                            apply_global_shift=False,
                            reliable_edge_margin_px=0))

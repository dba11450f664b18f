"""Feature-ablation timing of the full fused pipeline at bench scale."""
import os, sys, time
sys.path.insert(0,'/root/repo')
import jax, jax.numpy as jnp, numpy as np
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

H, W = 480, 640
base = scaled_ftp_config(H, W).replace(percentile_method="hist")
p2h = {"type":"hinge_saturating","params":{"a":2.08,"b":4.2,"c":0.0}}
ref, de = synthetic_pair(H, W, base)
r = jnp.asarray(ref); d = jnp.asarray(de)

def run(name, cfg, n=15):
    pipe = FTPPipeline(cfg, p2h)
    f = pipe._forward
    out = f(r, d); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(r, d)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:8.2f} ms", flush=True)

run("baseline", base)
run("no ECC", base.replace(use_ecc_crop_alignment=False))
run("ecc_iters=50", base.replace(ecc_iters=50))
run("no largest CC", base.replace(reliable_keep_largest_cc=False))
run("no blob filter", base.replace(filter_small_contact_blobs=False))
run("no frontier", base.replace(frontier_zero_enable=False))
run("no bad pixel", base.replace(bad_pixel_enable=False))
run("unwrap cg=8", base.replace(unwrap_cg_iters=8))
run("no global shift", base.replace(apply_global_shift=False))
run("no edge margin (EDT)", base.replace(reliable_edge_margin_px=0))
run("all-off", base.replace(use_ecc_crop_alignment=False,
                            reliable_keep_largest_cc=False,
                            filter_small_contact_blobs=False,
                            frontier_zero_enable=False,
                            bad_pixel_enable=False,
                            unwrap_cg_iters=8,
                            apply_global_shift=False,
                            reliable_edge_margin_px=0))

"""One process of a 2-process ``jax.distributed`` CPU bring-up.

Spawned by ``tests/test_parallel.py`` multihost tests (one instance per
rank).  Pins the CPU platform with 2 local virtual devices, joins the
coordinator through ``initialize_multihost`` (the production bring-up path,
``parallel/distributed.py``), builds the stream mesh over all 4 GLOBAL
devices, and runs one whole-limb fusion step whose collectives cross the
process boundary over Gloo.  Writes a per-rank result JSON.

Modes:

- ``fast``: the real ``whole_limb_step`` head (vmap + sign auto-detect +
  shard_map fusion with cross-process psum/pmax) over a cheap synthetic
  per-stream compute — compiles in seconds, runs in the fast suite.
- ``full``: the same head over the genuine FTP force pipeline at test scale
  (the multi-minute XLA:CPU compile makes this slow-suite only).

The persistent compile cache stays OFF in both ranks: asymmetric cache hits
make one rank reach the first collective minutes before the other, blowing
Gloo's 30 s rendezvous timeout.

Usage: python tests/multihost_worker.py <coord> <process_id> <num_procs> \
           <out.json> [fast|full]
"""
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


class _CheapForce:
    """Duck-typed stand-in for ``BatchedForce`` (fast mode): a trivially
    small per-stream compute with the same output contract, so the REAL
    fusion head — collectives included — is what the test exercises."""

    depth_eps_mm = 0.01

    def _single(self, ref_bgr, def_bgr):
        import jax.numpy as jnp
        diff = def_bgr.astype(jnp.float32) - ref_bgr.astype(jnp.float32)
        hm = jnp.mean(diff, axis=-1) / 100.0          # pseudo heightmap [mm]
        pos = jnp.clip(hm, 0.0, None)
        v = jnp.sum(pos) * 1e-4
        return {
            "force_N": 2.0 * v,
            "volume_cm3": v,
            "contact_area_mm2": jnp.sum(pos > self.depth_eps_mm).astype(jnp.float32),
            "max_depth_mm": jnp.max(pos),
            "height_map_mm": hm,
        }


def main():
    coord, pid, nproc, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "fast"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("XLA_FLAGS", None)  # device count set via config below

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from vistaf_tpu.parallel.distributed import initialize_multihost
    assert initialize_multihost(coord, nproc, pid) is True
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc          # global
    assert len(jax.local_devices()) == 2            # per process

    import numpy as np

    from vistaf_tpu.parallel.mesh import (BatchedForce, make_stream_mesh,
                                          shard_local_batch, whole_limb_step)
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W = 144, 192
    cfg = scaled_ftp_config(H, W).replace(
        percentile_method="hist", unwrap_cg_iters=8, ecc_iters=20,
        inpaint_iters=8)
    if mode == "full":
        from vistaf_tpu.ftp.pipeline import FTPPipeline
        p2h = {"type": "hinge_saturating",
               "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
        pipe = FTPPipeline(cfg, p2h)
        bf = BatchedForce(pipe, {"type": "growth",
                                 "params": {"a": 1.62, "b": 9.76}})
    else:
        bf = _CheapForce()

    mesh = make_stream_mesh()                        # spans both processes
    step = whole_limb_step(bf, mesh, map_stride=2)

    ref, de = synthetic_pair(H, W, cfg)
    n_local = len(jax.local_devices())
    ref_b = shard_local_batch(mesh, np.broadcast_to(ref, (n_local,) + ref.shape))
    def_b = shard_local_batch(mesh, np.broadcast_to(de, (n_local,) + de.shape))

    out = step(ref_b, def_b)
    jax.block_until_ready(out)

    forces = np.asarray(out["per_stream_force"])     # replicated -> addressable
    limb = np.asarray(out["whole_limb_map_mm"])
    result = {
        "process_id": pid,
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "total_force_N": float(out["total_force_N"]),
        "per_stream_force": [float(f) for f in forces],
        "max_depth_mm": float(out["max_depth_mm"]),
        "limb_map_shape": list(limb.shape),
        "limb_map_max": float(limb.max()),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)
    print(f"rank {pid} OK total={result['total_force_N']:.6f}", flush=True)


if __name__ == "__main__":
    main()

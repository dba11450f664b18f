"""Mesh construction + batched/sharded pipeline execution.

Design (SURVEY.md §5 "distributed communication backend"):

- axis ``stream``: data parallelism over camera streams / frames.  Each chip
  owns whole frames (FFT stages need global spatial context), so the only
  inter-chip traffic is the tiny per-stream result fusion.
- the multi-patch "whole-limb" head (BASELINE.json configs 4-5) runs as a
  ``shard_map`` over the mesh: per-stream force/contact reductions locally,
  then ``all_gather``/``psum`` over ICI to form the fused limb summary.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.pipelines.force import depth_map_to_volume_cm3


def make_stream_mesh(n_devices: Optional[int] = None,
                     devices: Optional[Sequence] = None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("stream",))


def shard_batch(mesh: Mesh, x):
    """Place a batch (leading axis = stream) sharded over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P("stream")))


class BatchedForce:
    """vmapped force forward over a stream batch, shardable over a mesh.

    Owns an FTPPipeline for its static geometry; the batched callable maps
    (B, H, W, 3) u8 ref/def frame stacks to per-stream force scalars plus
    contact summaries.
    """

    def __init__(self, pipe: FTPPipeline, force_model: Dict[str, Any],
                 grating_pitch_mm: float = 2.0, depth_eps_mm: float = 0.01):
        self.pipe = pipe
        self.force_model = force_model
        self.grating_pitch_mm = grating_pitch_mm
        self.depth_eps_mm = depth_eps_mm

    def _single(self, ref_bgr, def_bgr):
        from vistaf_tpu.calib import scalar_models
        res = self.pipe._forward_impl(ref_bgr, def_bgr)
        height = res["height_map_mm_crop"]
        roi = jnp.isfinite(height)
        mm_per_px = self.grating_pitch_mm / jnp.maximum(res["est_period_px"], 1e-9)
        v, a, d = depth_map_to_volume_cm3(height, roi, mm_per_px, self.depth_eps_mm)
        f = scalar_models.predict_force_from_volume(self.force_model, v)
        return {
            "force_N": f,
            "volume_cm3": v,
            "contact_area_mm2": a,
            "max_depth_mm": d,
            "height_map_mm": height,
        }

    def batched(self):
        return jax.vmap(self._single)

    def sharded(self, mesh: Mesh):
        fn = jax.vmap(self._single)
        in_sh = NamedSharding(mesh, P("stream"))
        return jax.jit(fn, in_shardings=(in_sh, in_sh))


def whole_limb_step(batched_force: BatchedForce, mesh: Mesh):
    """Multi-stream fusion head (BASELINE.json config 5): per-stream force
    locally, cross-stream aggregation over ICI via shard_map + psum/all_gather.

    Returns a jitted fn (ref_batch, def_batch) ->
    {per_stream_force, total_force_N, max_depth_mm, contact_area_mm2}.
    """
    single = batched_force._single

    def per_shard(ref_blk, def_blk):
        # ref_blk: (B/n, H, W, 3) local shard
        out = jax.vmap(single)(ref_blk, def_blk)
        local_forces = out["force_N"]
        # cross-stream collectives ride ICI
        all_forces = jax.lax.all_gather(local_forces, "stream", tiled=True)
        total = jax.lax.psum(jnp.sum(local_forces), "stream")
        max_depth = jax.lax.pmax(jnp.max(out["max_depth_mm"]), "stream")
        area = jax.lax.psum(jnp.sum(out["contact_area_mm2"]), "stream")
        return {
            "per_stream_force": all_forces,
            "total_force_N": total,
            "max_depth_mm": max_depth,
            "contact_area_mm2": area,
        }

    shard_map = jax.shard_map
    fn = shard_map(per_shard, mesh=mesh,
                   in_specs=(P("stream"), P("stream")),
                   out_specs={
                       "per_stream_force": P(),
                       "total_force_N": P(),
                       "max_depth_mm": P(),
                       "contact_area_mm2": P(),
                   },
                   # the ECC/labeling while_loops mix stream-varying and
                   # invariant carry components; skip the VMA type check
                   check_vma=False)
    return jax.jit(fn)

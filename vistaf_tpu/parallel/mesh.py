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


def shard_local_batch(mesh: Mesh, local_x):
    """Multi-process SPMD placement: each process contributes its LOCAL
    streams (leading axis) to the global batch sharded over ``mesh``.

    In a multi-host bring-up (``distributed.initialize_multihost``) the mesh
    spans non-addressable devices, where ``jax.device_put`` of host data is
    not allowed; ``make_array_from_process_local_data`` assembles the global
    array from per-process shards instead.  Single-process it degenerates to
    ``shard_batch``.
    """
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("stream")), np.asarray(local_x))


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


def whole_limb_step(batched_force: BatchedForce, mesh: Mesh,
                    map_stride: int = 1):
    """Multi-stream fusion head (BASELINE.json config 5).

    Two-layer design, each layer in its natural idiom:

    - per-stream compute: the vmapped force pipeline under ``jit`` with
      ``P('stream')`` input shardings — the GSPMD partitioner runs each
      stream's frames entirely on its own chip (the pipeline's inner
      while_loops stay single-device, no cross-stream types involved);
    - fusion head: an explicit ``shard_map`` over the small per-stream
      results only, with ICI collectives (psum/pmax/all_gather) forming
      the limb summary AND the whole-limb contact map — an
      (n_streams, h', w') atlas of per-patch contact-depth maps,
      replicated to every chip.  The head contains no control flow, so
      the varying-axis type check runs (no ``check_vma`` escape hatch).

    ``map_stride`` subsamples the per-patch maps before the all_gather to
    bound ICI traffic at rate (stride 2 => 4x less).
    Returns a jitted fn (ref_batch, def_batch) -> dict.
    """
    single = batched_force._single
    eps = batched_force.depth_eps_mm
    in_sh = NamedSharding(mesh, P("stream"))

    n_streams_axis = mesh.shape["stream"]

    def fuse(forces, areas, depths, maps):
        # all inputs are (B/n, ...) local shards of per-stream results;
        # every collective below rides ICI.  Gathers are expressed as
        # psum-of-placed-shards so the shard_map rep-checker can statically
        # prove the outputs replicated (a plain all_gather's replication is
        # not inferrable, which is what previously forced check_vma=False).
        i = jax.lax.axis_index("stream")
        nloc = forces.shape[0]
        B = nloc * n_streams_axis

        placed_f = jax.lax.dynamic_update_slice(
            jnp.zeros((B,), forces.dtype), forces, (i * nloc,))
        all_forces = jax.lax.psum(placed_f, "stream")
        placed_m = jax.lax.dynamic_update_slice(
            jnp.zeros((B,) + maps.shape[1:], maps.dtype), maps, (i * nloc, 0, 0))
        limb_map = jax.lax.psum(placed_m, "stream")

        total = jax.lax.psum(jnp.sum(forces), "stream")
        max_depth = jax.lax.pmax(jnp.max(depths), "stream")
        area = jax.lax.psum(jnp.sum(areas), "stream")
        return {
            "per_stream_force": all_forces,
            "total_force_N": total,
            "max_depth_mm": max_depth,
            "contact_area_mm2": area,
            "whole_limb_map_mm": limb_map,
        }

    fuse_sm = jax.shard_map(
        fuse, mesh=mesh,
        in_specs=(P("stream"), P("stream"), P("stream"), P("stream")),
        out_specs={
            "per_stream_force": P(),
            "total_force_N": P(),
            "max_depth_mm": P(),
            "contact_area_mm2": P(),
            "whole_limb_map_mm": P(),
        })

    def step(ref_b, def_b):
        out = jax.vmap(single)(ref_b, def_b)
        hm = out["height_map_mm"]
        # indentation-sign auto-detect per stream, mirroring
        # depth_map_to_volume_cm3 (force_sensor.py:106-108): whichever of
        # (+Z, -Z) integrates larger is the indentation side, so the limb
        # map stays correct with mm_keep_indentation_negative=True.
        hmf = jnp.where(jnp.isfinite(hm), hm, 0.0)
        pos_sum = jnp.sum(jnp.clip(hmf, 0.0, jnp.inf), axis=(1, 2), keepdims=True)
        neg_sum = jnp.sum(jnp.clip(-hmf, 0.0, jnp.inf), axis=(1, 2), keepdims=True)
        depth = jnp.where(neg_sum > pos_sum, -hmf, hmf)
        contact_depth = jnp.where(jnp.isfinite(hm) & (depth > eps), depth, 0.0)
        if map_stride > 1:
            contact_depth = contact_depth[:, ::map_stride, ::map_stride]
        return fuse_sm(out["force_N"], out["contact_area_mm2"],
                       out["max_depth_mm"], contact_depth)

    return jax.jit(step, in_shardings=(in_sh, in_sh))


def motion_gate(accel_mss, ok_mss: float = 2.0, cut_mss: float = 20.0):
    """Per-stream IMU motion gate in [0, 1].

    A skin patch accelerating fast is motion-blurred (the FTP carrier
    smears), so its frame's contribution is downweighted with a linear ramp:
    1 below ``ok_mss`` residual acceleration, 0 above ``cut_mss``.
    ``accel_mss``: (..., 3) linear acceleration with gravity removed [m/s^2].
    """
    mag = jnp.sqrt(jnp.sum(jnp.square(accel_mss), axis=-1))
    return jnp.clip((cut_mss - mag) / (cut_mss - ok_mss), 0.0, 1.0)


def whole_limb_step_aux(batched_force: BatchedForce, mesh: Mesh,
                        canvas_hw, map_stride: int = 1,
                        gate_ok_mss: float = 2.0, gate_cut_mss: float = 20.0):
    """Config-5 fusion head WITH auxiliary proprioception/IMU streams
    (BASELINE.json configs[4]: "vision tactile + IMU/proprioception streams
    -> whole-limb contact map").  The reference has no counterpart (it is
    single-patch, single-process); this closes the BASELINE clause the
    TPU-native way: the aux pytree rides the same ``P('stream')`` sharding
    as the frames, and the placement/fusion runs inside the shard_map with
    rep-checkable ICI collectives.

    Aux pytree (leading axis = stream, sharded over the mesh):

    - ``pose_px``: (B, 2) int32 — top-left (y, x) of the patch on the shared
      limb canvas, in canvas pixels at stride 1 (proprioception: the robot's
      forward kinematics locates each skin patch on the limb surface).
    - ``accel_mss``: (B, 3) float32 — gravity-removed IMU acceleration of
      the patch; fast-moving (motion-blurred) streams are downweighted via
      ``motion_gate``.

    Returns a jitted ``step(ref_b, def_b, aux) -> dict`` whose
    ``limb_canvas_mm`` is an (canvas_h/stride, canvas_w/stride) contact-depth
    map assembled by pose-indexed placement (max-blend where patches
    overlap) and replicated to every chip; scalar summaries are gated sums.
    """
    single = batched_force._single
    eps = batched_force.depth_eps_mm
    in_sh = NamedSharding(mesh, P("stream"))
    ch, cw = int(canvas_hw[0]) // map_stride, int(canvas_hw[1]) // map_stride

    n_streams_axis = mesh.shape["stream"]

    def fuse(forces, areas, depths, maps, pose, gate):
        i = jax.lax.axis_index("stream")
        nloc = forces.shape[0]
        B = nloc * n_streams_axis

        gf = forces * gate
        placed_f = jax.lax.dynamic_update_slice(
            jnp.zeros((B,), gf.dtype), gf, (i * nloc,))
        all_forces = jax.lax.psum(placed_f, "stream")
        placed_g = jax.lax.dynamic_update_slice(
            jnp.zeros((B,), gate.dtype), gate, (i * nloc,))
        all_gates = jax.lax.psum(placed_g, "stream")

        # pose-indexed placement: max-blend each local patch onto the canvas
        # (overlapping patches must not double-count depth), then pmax over
        # the mesh -> replicated whole-limb canvas.
        canvas = jnp.zeros((ch, cw), maps.dtype)
        ph, pw = maps.shape[1], maps.shape[2]
        for k in range(nloc):                      # nloc is static and small
            yx = jnp.clip(pose[k] // map_stride,
                          jnp.zeros((2,), pose.dtype),
                          jnp.array([ch - ph, cw - pw], pose.dtype))
            region = jax.lax.dynamic_slice(canvas, (yx[0], yx[1]), (ph, pw))
            canvas = jax.lax.dynamic_update_slice(
                canvas, jnp.maximum(region, maps[k] * gate[k]), (yx[0], yx[1]))
        canvas = jax.lax.pmax(canvas, "stream")

        total = jax.lax.psum(jnp.sum(gf), "stream")
        max_depth = jax.lax.pmax(jnp.max(depths * gate), "stream")
        area = jax.lax.psum(jnp.sum(areas * gate), "stream")
        return {
            "per_stream_force": all_forces,
            "stream_gate": all_gates,
            "total_force_N": total,
            "max_depth_mm": max_depth,
            "contact_area_mm2": area,
            "limb_canvas_mm": canvas,
        }

    fuse_sm = jax.shard_map(
        fuse, mesh=mesh,
        in_specs=(P("stream"), P("stream"), P("stream"), P("stream"),
                  P("stream"), P("stream")),
        out_specs={
            "per_stream_force": P(),
            "stream_gate": P(),
            "total_force_N": P(),
            "max_depth_mm": P(),
            "contact_area_mm2": P(),
            "limb_canvas_mm": P(),
        })

    def step(ref_b, def_b, aux):
        out = jax.vmap(single)(ref_b, def_b)
        hm = out["height_map_mm"]
        hmf = jnp.where(jnp.isfinite(hm), hm, 0.0)
        pos_sum = jnp.sum(jnp.clip(hmf, 0.0, jnp.inf), axis=(1, 2), keepdims=True)
        neg_sum = jnp.sum(jnp.clip(-hmf, 0.0, jnp.inf), axis=(1, 2), keepdims=True)
        depth = jnp.where(neg_sum > pos_sum, -hmf, hmf)
        contact_depth = jnp.where(jnp.isfinite(hm) & (depth > eps), depth, 0.0)
        if map_stride > 1:
            contact_depth = contact_depth[:, ::map_stride, ::map_stride]
        gate = motion_gate(aux["accel_mss"].astype(jnp.float32),
                           gate_ok_mss, gate_cut_mss)
        pose = aux["pose_px"].astype(jnp.int32)
        return fuse_sm(out["force_N"], out["contact_area_mm2"],
                       out["max_depth_mm"], contact_depth, pose, gate)

    aux_sh = {"pose_px": in_sh, "accel_mss": in_sh}
    return jax.jit(step, in_shardings=(in_sh, in_sh, aux_sh))

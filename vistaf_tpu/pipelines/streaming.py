"""Streaming multi-patch inference with temporal smoothing.

BASELINE.json config 4: "multi-patch batched inference: 4 skin-camera
streams with temporal smoothing window".  The per-frame pipelines are pure,
so streaming state is an explicit pytree threaded through a jitted update:
a ring buffer of the last K per-stream force readings with median/mean/EMA
smoothing, plus contact-state hysteresis.
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class StreamState(NamedTuple):
    ring: jnp.ndarray       # (n_streams, window) recent force readings
    count: jnp.ndarray      # () total frames seen
    ema: jnp.ndarray        # (n_streams,) exponential moving average
    in_contact: jnp.ndarray  # (n_streams,) bool hysteresis state


def init_state(n_streams: int, window: int = 8) -> StreamState:
    return StreamState(
        ring=jnp.zeros((n_streams, window), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        ema=jnp.zeros((n_streams,), jnp.float32),
        in_contact=jnp.zeros((n_streams,), bool),
    )


def update(state: StreamState, forces: jnp.ndarray,
           ema_alpha: float = 0.2,
           contact_on_N: float = 0.3, contact_off_N: float = 0.1
           ) -> Tuple[StreamState, Dict[str, jnp.ndarray]]:
    """One streaming step: push per-stream forces, return smoothed readings.

    Jittable; composes with the vmapped force pipeline:
        state, out = update(state, batched_force(refs, frames)["force_N"])
    """
    window = state.ring.shape[1]
    slot = jnp.mod(state.count, window)
    ring = state.ring.at[:, slot].set(forces.astype(jnp.float32))
    count = state.count + 1

    n_valid = jnp.minimum(count, window).astype(jnp.float32)
    # masked statistics over the filled portion of the ring
    idx = jax.lax.broadcasted_iota(jnp.int32, state.ring.shape, 1)
    valid = idx < jnp.minimum(count, window)
    rsum = jnp.sum(jnp.where(valid, ring, 0.0), axis=1)
    mean = rsum / jnp.maximum(n_valid, 1.0)
    big = jnp.float32(3e38)
    sorted_ring = jnp.sort(jnp.where(valid, ring, big), axis=1)
    mid = ((jnp.minimum(count, window) - 1) // 2).astype(jnp.int32)
    median = jnp.take_along_axis(
        sorted_ring, jnp.full((ring.shape[0], 1), mid, jnp.int32), axis=1)[:, 0]

    ema = jnp.where(count == 1, forces,
                    (1.0 - ema_alpha) * state.ema + ema_alpha * forces)

    in_contact = jnp.where(
        state.in_contact, median > contact_off_N, median > contact_on_N)

    new_state = StreamState(ring, count, ema, in_contact)
    out = {
        "force_mean_N": mean,
        "force_median_N": median,
        "force_ema_N": ema,
        "in_contact": in_contact,
        "total_force_N": jnp.sum(median),
    }
    return new_state, out


class StreamingForce:
    """Convenience wrapper: vmapped force pipeline + temporal smoothing in
    one jitted step over a stream batch (optionally sharded over a mesh)."""

    def __init__(self, batched_force, n_streams: int, window: int = 8,
                 ema_alpha: float = 0.2, mesh=None):
        self.n_streams = n_streams
        self._state = init_state(n_streams, window)
        inner = batched_force.batched()

        def step(state, refs, frames):
            res = inner(refs, frames)
            new_state, out = update(state, res["force_N"], ema_alpha)
            out["force_raw_N"] = res["force_N"]
            out["max_depth_mm"] = res["max_depth_mm"]
            return new_state, out

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            sh = NamedSharding(mesh, P("stream"))
            rep = NamedSharding(mesh, P())
            self._step = jax.jit(step, in_shardings=(
                jax.tree_util.tree_map(lambda _: rep, self._state), sh, sh))
        else:
            self._step = jax.jit(step)

    def __call__(self, refs, frames) -> Dict[str, np.ndarray]:
        self._state, out = self._step(self._state, refs, frames)
        return {k: np.asarray(v) for k, v in out.items()}

    def reset(self, window: Optional[int] = None) -> None:
        w = window or self._state.ring.shape[1]
        self._state = init_state(self.n_streams, w)

    # ------------------------------------------------------------------
    def run_overlapped(self, refs, frames_seq) -> list:
        """Drive a frame sequence with double-buffered ingest: frame N+1's
        host->device upload is enqueued while frame N computes.

        ``jax.device_put`` returns immediately with the copy enqueued on the
        transfer engine, and the jitted step dispatches asynchronously, so
        the H2D DMA of the next batch overlaps the current batch's compute
        (the reference decodes + uploads synchronously inside its per-frame
        loop, ``multimodal_sensor.py:370-382``).  ``frames_seq`` is an
        iterable of (n_streams, H, W, 3) uint8 batches; returns the list of
        per-step output dicts (fetched lazily — one sync at the end)."""
        refs_dev = jax.device_put(refs)
        it = iter(frames_seq)
        try:
            nxt = jax.device_put(next(it))
        except StopIteration:
            return []
        outs = []
        done = False
        while not done:
            cur = nxt
            try:
                nxt = jax.device_put(next(it))   # upload N+1 ...
            except StopIteration:
                done = True
            self._state, out = self._step(self._state, refs_dev, cur)  # ... while N computes
            outs.append(out)
        return [{k: np.asarray(v) for k, v in o.items()} for o in outs]

"""Euclidean distance transform via jump flooding — O(log n) passes, all
vector ops, no sequential scans.

The reference uses cv2.distanceTransform(DIST_L2, maskSize=3), a two-pass
*chamfer approximation* (weights 0.955/1.3693) that is inherently serial.
Jump flooding computes the (near-)exact Euclidean distance with ~log2(max(h,w))
rounds of 8 shifted comparisons, which maps cleanly onto the VPU.  The exact
EDT is pointwise >= accurate than the chamfer approximation; all consumers
(distance erosion ``shape_ftp.py:721-726``, frontier tapers
``shape_ftp.py:1287-1324``, hole-edge margin ``shape_ftp.py:1172``) use it
through thresholds/ratios where the <2% chamfer discrepancy was noise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Plain Python int, NOT jnp.int32(...): a module-level jnp scalar is a
# device-resident array, and closure-capturing any pre-existing device buffer
# into a jitted graph permanently degrades every subsequent blocking dispatch
# in the process by ~30 ms on tunneled TPU platforms (measured; see
# docs/PERFORMANCE.md).  Weak-typed literals compile to identical HLO.
_FAR = 1 << 20


def _shift2(a: jnp.ndarray, dy: int, dx: int, fill) -> jnp.ndarray:
    """Shift a (H, W, C) array so out[i, j] = a[i + dy, j + dx]; out-of-range
    entries get ``fill`` (no wraparound)."""
    h, w = a.shape[:2]
    out = a
    if dy > 0:
        out = jnp.concatenate([out[dy:], jnp.full_like(out[:dy], fill)], axis=0)
    elif dy < 0:
        out = jnp.concatenate([jnp.full_like(out[dy:], fill), out[:dy]], axis=0)
    if dx > 0:
        out = jnp.concatenate([out[:, dx:], jnp.full_like(out[:, :dx], fill)], axis=1)
    elif dx < 0:
        out = jnp.concatenate([jnp.full_like(out[:, dx:], fill), out[:, :dx]], axis=1)
    return out


@functools.partial(jax.jit, static_argnames=("max_dist",))
def distance_transform_edt(mask: jnp.ndarray, max_dist: int = 0) -> jnp.ndarray:
    """For each True pixel, Euclidean distance to the nearest False pixel
    (cv2.distanceTransform semantics: nonzero -> distance to nearest zero).

    Returns float32; 0 on False pixels.

    ``max_dist`` > 0 bounds the flood schedule: distances <= max_dist stay
    (near-)exact while farther pixels may report inflated values — use when
    the consumer only compares against thresholds <= max_dist (tapers,
    margins), cutting the number of sequential flood rounds.
    """
    h, w = mask.shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # Seeds are the False pixels; each pixel tracks its current-best seed coords.
    seed = ~mask
    ny = jnp.where(seed, yy, _FAR)
    nx = jnp.where(seed, xx, _FAR)

    def dist2(ny, nx):
        dy = (yy - ny).astype(jnp.float32)
        dx = (xx - nx).astype(jnp.float32)
        d = dy * dy + dx * dx
        return jnp.where(ny >= _FAR, jnp.float32(3e38), d)

    coords = jnp.stack([ny, nx], axis=-1)

    step = 1
    size = max(h, w) if max_dist <= 0 else min(max(h, w), 2 * int(max_dist))
    steps = []
    while step < size:
        step *= 2
    while step >= 1:
        steps.append(step)
        step //= 2
    steps.append(1)  # extra k=1 pass (JFA+1) kills most propagation errors

    best = coords
    bestd = dist2(best[..., 0], best[..., 1])
    for k in steps:
        for dy in (-k, 0, k):
            for dx in (-k, 0, k):
                if dy == 0 and dx == 0:
                    continue
                cand = _shift2(best, dy, dx, _FAR)
                candd = dist2(cand[..., 0], cand[..., 1])
                take = candd < bestd
                best = jnp.where(take[..., None], cand, best)
                bestd = jnp.where(take, candd, bestd)

    d = jnp.sqrt(bestd)
    d = jnp.where(mask, d, 0.0)
    return d.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("max_dist",))
def distance_transform_chamfer3(mask: jnp.ndarray, max_dist: int = 0) -> jnp.ndarray:
    """cv2.distanceTransform(src, DIST_L2, maskSize=3) — the 3x3 chamfer
    metric with OpenCV's weights a=0.955 (edge), b=1.3693 (diagonal).

    cv2 computes it with two serial raster scans; here the same fixed point
    is reached by iterating the 8-neighbor min-plus relaxation (one bounded
    ``fori_loop`` of fused shift/min ops — each round propagates one pixel).
    ``max_dist`` bounds the rounds: distances <= max_dist are exact in the
    chamfer metric, farther pixels saturate.  Chamfer distances deviate from
    Euclidean by up to ~4.5% direction-dependently, and the reference's
    frontier tapers inherit that bias — use THIS transform wherever parity
    with the committed outputs matters (all reference call sites use it:
    shape_ftp.py:725,790,1172,1309,1312).
    """
    a, b = 0.955, 1.3693
    h, w = mask.shape
    big = jnp.float32(3e8)
    d = jnp.where(mask, big, 0.0).astype(jnp.float32)

    # The chamfer metric is the cone metric d(dx,dy) = b*min+a*(max-min)
    # over |dx|,|dy|; a jump of s pixels along an axis costs exactly s*a and
    # a diagonal jump s*b, so the binary decomposition of the optimal
    # staircase path is itself optimal: descending power-of-2 relaxation
    # (applied twice per scale, axis+diagonal legs of the same power can
    # both occur) reaches the exact fixed point in O(log n) fused rounds
    # instead of one round per pixel of distance.
    reach = max(h, w) if not max_dist or max_dist <= 0 else min(
        max(h, w), int(max_dist / a) + 2)
    s = 1
    scales = []
    while s < reach:
        scales.append(s)
        s *= 2
    passes = list(reversed(scales)) + list(reversed(scales)) + [1]

    for s in passes:
        for dy, dx, cost in ((0, s, s * a), (0, -s, s * a), (s, 0, s * a), (-s, 0, s * a),
                             (s, s, s * b), (s, -s, s * b), (-s, s, s * b), (-s, -s, s * b)):
            d = jnp.minimum(d, _shift2(d[..., None], dy, dx, big)[..., 0] + cost)
    return jnp.where(mask, d, 0.0).astype(jnp.float32)


def get_distance_fn(metric: str):
    """'euclid' = exact jump-flooding EDT (TPU-fast); 'chamfer3' = cv2
    DIST_L2 3x3 chamfer (reference-faithful)."""
    if metric == "euclid":
        return distance_transform_edt
    if metric == "chamfer3":
        return distance_transform_chamfer3
    raise ValueError(f"unknown distance metric: {metric}")


def erode_by_distance(mask: jnp.ndarray, margin_px: float,
                      metric: str = "euclid") -> jnp.ndarray:
    """Keep pixels deeper than ``margin_px`` from the mask boundary
    (``shape_ftp.py:721-726``)."""
    if margin_px <= 0:
        return mask
    dist = get_distance_fn(metric)(mask, max_dist=2 * int(margin_px) + 2)
    return (dist > float(margin_px)) & mask

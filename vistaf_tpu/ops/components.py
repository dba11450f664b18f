"""Connected components on TPU: neighbor-min label propagation with pointer
jumping — O(log^2 diameter) data-parallel rounds instead of the serial
union-find inside cv2.connectedComponentsWithStats.

Labels are root pixel indices (flattened row-major); background is -1.
Per-component statistics (area, max) come from scatter reductions keyed by
the root label, so "largest component" and "per-blob peak depth" filters
(``shape_ftp.py:707-719``, ``shape_ftp.py:1215-1271``) are two fused
scatter+gather passes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Plain int, not jnp.int32 — module-level device scalars poison blocking
# dispatch latency process-wide on tunneled TPU platforms (docs/PERFORMANCE.md).
_BIG = 2147480000


def _neighbor_min(lab: jnp.ndarray, mask: jnp.ndarray, connectivity: int) -> jnp.ndarray:
    l = jnp.where(mask, lab, _BIG)
    out = l
    shifts4 = [(-1, 0), (1, 0), (0, -1), (0, 1)]
    shifts8 = shifts4 + [(-1, -1), (-1, 1), (1, -1), (1, 1)]
    for dy, dx in (shifts8 if connectivity == 8 else shifts4):
        s = l
        if dy > 0:
            s = jnp.concatenate([s[dy:], jnp.full_like(s[:dy], _BIG)], axis=0)
        elif dy < 0:
            s = jnp.concatenate([jnp.full_like(s[dy:], _BIG), s[:dy]], axis=0)
        if dx > 0:
            s = jnp.concatenate([s[:, dx:], jnp.full_like(s[:, :dx], _BIG)], axis=1)
        elif dx < 0:
            s = jnp.concatenate([jnp.full_like(s[:, dx:], _BIG), s[:, :dx]], axis=1)
        out = jnp.minimum(out, s)
    return jnp.where(mask, out, _BIG)


@functools.partial(jax.jit, static_argnames=("connectivity",))
def label(mask: jnp.ndarray, connectivity: int = 8) -> jnp.ndarray:
    """Connected-component labels: each True pixel gets the flat index of its
    component's root (minimum) pixel; False pixels get -1."""
    h, w = mask.shape
    n = h * w
    idx = jnp.arange(n, dtype=jnp.int32).reshape(h, w)
    lab = jnp.where(mask, idx, _BIG)

    def jump(lab_flat):
        # pointer jumping: follow labels-as-pointers through the flat array
        safe = jnp.minimum(lab_flat, n - 1)
        nxt = jnp.where(lab_flat < n, lab_flat[safe], lab_flat)
        return nxt

    def body(state):
        lab, _ = state
        new = _neighbor_min(lab, mask, connectivity)
        flat = new.ravel()
        # aggressive path compression: 8 pointer-halving steps collapse
        # parent chains up to 2^8 long per round, so outer rounds scale with
        # log of the component diameter rather than the diameter itself
        for _ in range(8):
            flat = jump(flat)
        new = flat.reshape(h, w)
        changed = jnp.any(new != lab)
        return new, changed

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(cond, body, (lab, jnp.bool_(True)))
    return jnp.where(mask, lab, -1)


def component_areas(labels: jnp.ndarray) -> jnp.ndarray:
    """Scatter-add areas keyed by root index (flat length h*w)."""
    h, w = labels.shape
    n = h * w
    flat = labels.ravel()
    valid = flat >= 0
    key = jnp.where(valid, flat, 0)
    return jnp.zeros((n,), jnp.int32).at[key].add(valid.astype(jnp.int32))


@jax.jit
def largest_component(mask: jnp.ndarray) -> jnp.ndarray:
    """Largest 8-connected component of a boolean mask
    (``shape_ftp.py:707-719``)."""
    labels = label(mask, 8)
    areas = component_areas(labels)
    best = jnp.argmax(areas).astype(jnp.int32)
    out = (labels == best) & mask
    return jnp.where(jnp.any(mask), out, mask)


@functools.partial(jax.jit, static_argnames=("seed_pool",))
def dominant_component(mask: jnp.ndarray, seed_pool: int = 1) -> jnp.ndarray:
    """Component containing the mask's deepest interior point (EDT argmax),
    via geodesic reconstruction — a cheap stand-in for largest_component on
    masks shaped like this sensor's reliable region (one dominant blob plus
    specks), where deepest-inscribed-disk == largest-area.

    ``seed_pool`` > 1 runs the EDT on a min-pooled mask (pool^2 less
    jump-flooding work): the pooled deepest point maps to a full-res pixel
    at least ``seed_pool`` px inside the same blob, and the full-res
    reconstruction is unchanged.  If the mask has no all-true pool block
    (no interior at the pooled scale), the full-res EDT seed runs instead.

    Deploy-mode alternative selected by FTPConfig.largest_cc_method /
    cc_seed_pool."""
    from vistaf_tpu.ops.distance import distance_transform_edt
    from vistaf_tpu.ops.morphology import reconstruct

    h, w = mask.shape
    if seed_pool > 1 and min(h, w) >= 8 * seed_pool:
        ds = int(seed_pool)
        hh, ww = (h // ds) * ds, (w // ds) * ds
        mp = mask[:hh, :ww].reshape(hh // ds, ds, ww // ds, ds).all(axis=(1, 3))
        dist = distance_transform_edt(mp)
        sf = jnp.argmax(dist.ravel())
        sy = (sf // mp.shape[1]).astype(jnp.int32) * ds + ds // 2
        sx = (sf % mp.shape[1]).astype(jnp.int32) * ds + ds // 2
        yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        seed = ((yy == sy) & (xx == sx)) & mask
        out = reconstruct(seed, mask)
        # degenerate: a mask with no interior at the pooled scale (argmax
        # lands on dist==0) gets the full-res seed path — under lax.cond so
        # the expensive full-res EDT only executes when actually needed
        ok = jnp.any(seed) & (dist.ravel()[sf] > 0)
        out = jax.lax.cond(ok, lambda _: out,
                           lambda _: _dominant_component_fine(mask), None)
        return jnp.where(jnp.any(mask), out, mask)
    return jnp.where(jnp.any(mask), _dominant_component_fine(mask), mask)


def _dominant_component_fine(mask: jnp.ndarray) -> jnp.ndarray:
    from vistaf_tpu.ops.distance import distance_transform_edt
    from vistaf_tpu.ops.morphology import reconstruct

    h, w = mask.shape
    dist = distance_transform_edt(mask)
    seed_flat = jnp.argmax(dist.ravel())
    seed = jnp.zeros((h * w,), bool).at[seed_flat].set(True).reshape(h, w) & mask
    return reconstruct(seed, mask)


@functools.partial(jax.jit, static_argnames=("min_area_px",))
def filter_components_by_peak(mask: jnp.ndarray, values: jnp.ndarray,
                              threshold: jnp.ndarray,
                              min_area_px: int = 0) -> jnp.ndarray:
    """Keep components whose per-component max of ``values`` >= threshold
    (and area >= min_area_px).  Used by the contact-blob depth filter
    (``shape_ftp.py:1215-1271``).

    Without an area constraint (the reference default) this is exactly
    geodesic reconstruction from the deep-enough seed pixels — no labeling
    needed.  With ``min_area_px`` the label-based path runs instead.
    """
    if not min_area_px or min_area_px <= 0:
        from vistaf_tpu.ops.morphology import reconstruct
        seed = mask & (values >= threshold)
        return reconstruct(seed, mask)

    h, w = mask.shape
    n = h * w
    labels = label(mask, 8)
    flat = labels.ravel()
    valid = flat >= 0
    key = jnp.where(valid, flat, 0)
    v = jnp.where(valid, values.ravel(), -3e38)
    peaks = jnp.full((n,), -3e38, jnp.float32).at[key].max(v.astype(jnp.float32))
    keep = peaks[key] >= threshold
    areas = component_areas(labels)
    keep = keep & (areas[key] >= min_area_px)
    keep = keep & valid
    return keep.reshape(h, w)

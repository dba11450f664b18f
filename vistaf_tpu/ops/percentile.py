"""Masked percentile / median reductions.

The reference leans on ``np.nanpercentile`` over boolean masks everywhere
(``shape_ftp.py:334-354``).  On TPU a full sort is exact but costs
O(n log^2 n); a two-pass histogram refinement is nearly exact and much
cheaper.  Both are provided; pipelines default to the sort path (bit-faithful
to NumPy's linear interpolation) and can opt into the histogram path for
latency-critical deployments.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Plain float, not jnp.float32 — module-level device scalars poison blocking
# dispatch latency process-wide on tunneled TPU platforms (docs/PERFORMANCE.md).
_BIG = 3.0e38


def masked_percentile(arr: jnp.ndarray, mask: jnp.ndarray, q,
                      fallback: float = 0.0) -> jnp.ndarray:
    """np.percentile(arr[mask], q) with linear interpolation; NaNs excluded.

    ``q`` may be a scalar or a tuple of scalars (static).  Returns float32
    scalar (or stacked vector for tuple q).  Empty masks return ``fallback``.
    """
    x = arr.astype(jnp.float32).ravel()
    m = (mask.ravel() if mask is not None else jnp.ones_like(x, dtype=bool)) & jnp.isfinite(x)
    n = jnp.sum(m.astype(jnp.int32))
    xs = jnp.sort(jnp.where(m, x, _BIG))

    qs = q if isinstance(q, (tuple, list)) else (q,)

    def one(qq):
        pos = jnp.asarray(qq, jnp.float32) / 100.0 * (n.astype(jnp.float32) - 1.0)
        pos = jnp.maximum(pos, 0.0)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, jnp.maximum(n - 1, 0))
        frac = pos - lo.astype(jnp.float32)
        v = xs[lo] * (1.0 - frac) + xs[hi] * frac
        return jnp.where(n > 0, v, jnp.float32(fallback))

    out = jnp.stack([one(qq) for qq in qs])
    return out[0] if not isinstance(q, (tuple, list)) else out


def masked_median(arr: jnp.ndarray, mask: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    return masked_percentile(arr, mask, 50.0, fallback=fallback)


@functools.partial(jax.jit, static_argnames=("bins", "refine"))
def masked_percentile_hist(arr: jnp.ndarray, mask: jnp.ndarray, q: float,
                           bins: int = 128, refine: int = 2,
                           fallback: float = 0.0) -> jnp.ndarray:
    """Approximate masked percentile via iterative threshold-count
    refinement.

    Counts elements below a ladder of ``bins`` thresholds (one broadcasted
    compare + reduction per pass — no scatter, pure VPU) and narrows the
    bracket ``1 + refine`` times: error ~ range / bins^(1+refine), far below
    the noise floor of any threshold in this pipeline and far cheaper than a
    sort on TPU.  Scalar ``q`` only.
    """
    x = arr.astype(jnp.float32).ravel()
    m = (mask.ravel() if mask is not None else jnp.ones_like(x, dtype=bool)) & jnp.isfinite(x)
    n = jnp.sum(m.astype(jnp.float32))
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(m, x, big))
    hi = jnp.max(jnp.where(m, x, -big))
    # rank such that count(x <= v) ~ target rank + 1
    target = jnp.asarray(q, jnp.float32) / 100.0 * jnp.maximum(n - 1.0, 0.0)

    def pass_once(carry):
        lo, hi = carry
        span = jnp.maximum(hi - lo, 1e-30)
        edges = lo + span * jnp.arange(1, bins + 1, dtype=jnp.float32) / bins  # (B,)
        # counts[b] = #masked x <= edges[b]; one (N, B) compare + reduce
        le = (x[:, None] <= edges[None, :]) & m[:, None]
        counts = jnp.sum(le.astype(jnp.float32), axis=0)
        # smallest bin whose cumulative count exceeds the target rank
        bin_i = jnp.sum((counts <= target).astype(jnp.int32))
        bin_i = jnp.clip(bin_i, 0, bins - 1)
        new_lo = lo + span * bin_i / bins
        new_hi = lo + span * (bin_i + 1) / bins
        return new_lo, new_hi

    for _ in range(1 + refine):
        lo, hi = pass_once((lo, hi))
    v = 0.5 * (lo + hi)
    return jnp.where(n > 0, v, jnp.float32(fallback))


def get_percentile_fn(method: str):
    """Select the percentile implementation: 'sort' (exact, NumPy-faithful)
    or 'hist' (two-pass histogram, much cheaper on TPU)."""
    if method == "sort":
        return masked_percentile
    if method == "hist":
        def f(arr, mask, q, fallback=0.0):
            if isinstance(q, (tuple, list)):
                return jnp.stack([masked_percentile_hist(arr, mask, qq, fallback=fallback) for qq in q])
            return masked_percentile_hist(arr, mask, q, fallback=fallback)
        return f
    raise ValueError(f"unknown percentile method: {method}")


def masked_mean(arr: jnp.ndarray, mask: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    x = arr.astype(jnp.float32)
    m = mask & jnp.isfinite(x)
    n = jnp.sum(m.astype(jnp.float32))
    s = jnp.sum(jnp.where(m, x, 0.0))
    return jnp.where(n > 0, s / jnp.maximum(n, 1.0), jnp.float32(fallback))


def masked_min(arr: jnp.ndarray, mask: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    x = arr.astype(jnp.float32)
    m = mask & jnp.isfinite(x)
    v = jnp.min(jnp.where(m, x, _BIG))
    return jnp.where(jnp.any(m), v, jnp.float32(fallback))


def masked_max(arr: jnp.ndarray, mask: jnp.ndarray, fallback: float = 0.0) -> jnp.ndarray:
    x = arr.astype(jnp.float32)
    m = mask & jnp.isfinite(x)
    v = jnp.max(jnp.where(m, x, -_BIG))
    return jnp.where(jnp.any(m), v, jnp.float32(fallback))

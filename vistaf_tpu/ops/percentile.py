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


@functools.partial(jax.jit, static_argnames=("qs", "bins", "refine"))
def masked_percentile_hist_multi(arr: jnp.ndarray, mask: jnp.ndarray, qs: tuple,
                                 bins: int = 128, refine: int = 2,
                                 fallback: float = 0.0) -> jnp.ndarray:
    """Vector of masked percentiles sharing histogram passes.

    The first (global-range) counting pass is computed once for all
    quantiles; each refinement narrows every bracket simultaneously with a
    single (N, Q, B) compare+reduce — 1+refine kernels total instead of
    Q*(1+refine).
    """
    Q = len(qs)
    x = arr.astype(jnp.float32).ravel()
    m = (mask.ravel() if mask is not None else jnp.ones_like(x, dtype=bool)) & jnp.isfinite(x)
    mf = m.astype(jnp.float32)
    n = jnp.sum(mf)
    big = jnp.float32(3e38)
    glo = jnp.min(jnp.where(m, x, big))
    ghi = jnp.max(jnp.where(m, x, -big))
    targets = jnp.asarray([q / 100.0 for q in qs], jnp.float32) * jnp.maximum(n - 1.0, 0.0)

    # shared first pass over the global range
    span = jnp.maximum(ghi - glo, 1e-30)
    edges = glo + span * jnp.arange(1, bins + 1, dtype=jnp.float32) / bins
    counts = jnp.sum(((x[:, None] <= edges[None, :]) & m[:, None]).astype(jnp.float32), axis=0)
    bin_i = jnp.sum((counts[None, :] <= targets[:, None]).astype(jnp.int32), axis=1)
    bin_i = jnp.clip(bin_i, 0, bins - 1)
    lo = glo + span * bin_i.astype(jnp.float32) / bins          # (Q,)
    hi = glo + span * (bin_i + 1).astype(jnp.float32) / bins

    for _ in range(refine):
        span = jnp.maximum(hi - lo, 1e-30)                       # (Q,)
        e = lo[:, None] + span[:, None] * jnp.arange(1, bins + 1, dtype=jnp.float32)[None, :] / bins
        le = (x[:, None, None] <= e[None, :, :]) & m[:, None, None]
        c = jnp.sum(le.astype(jnp.float32), axis=0)              # (Q, B)
        bi = jnp.sum((c <= targets[:, None]).astype(jnp.int32), axis=1)
        bi = jnp.clip(bi, 0, bins - 1)
        new_lo = lo + span * bi.astype(jnp.float32) / bins
        hi = lo + span * (bi + 1).astype(jnp.float32) / bins
        lo = new_lo
    v = 0.5 * (lo + hi)
    return jnp.where(n > 0, v, jnp.float32(fallback))


@functools.partial(jax.jit, static_argnames=("qs", "bins", "refine"))
def masked_percentile_hist_rows(X: jnp.ndarray, M: jnp.ndarray, qs: tuple,
                                bins: int = 128, refine: int = 2,
                                fallback: float = 0.0) -> jnp.ndarray:
    """Row-wise masked percentiles with shared counting passes.

    ``X`` is (K, N) — K unrelated arrays raveled to rows; ``M`` is (K, N)
    masks; ``qs`` is one quantile per row.  Each pass is a single
    (K, N, B) compare+reduce, so K percentile calls cost one kernel chain
    instead of K (the pipeline is launch-bound on TPU).
    """
    K = X.shape[0]
    assert len(qs) == K
    x = X.astype(jnp.float32)
    m = M & jnp.isfinite(x)
    n = jnp.sum(m.astype(jnp.float32), axis=1)                   # (K,)
    big = jnp.float32(3e38)
    lo = jnp.min(jnp.where(m, x, big), axis=1)
    hi = jnp.max(jnp.where(m, x, -big), axis=1)
    targets = jnp.asarray([q / 100.0 for q in qs], jnp.float32) * jnp.maximum(n - 1.0, 0.0)

    for _ in range(1 + refine):
        span = jnp.maximum(hi - lo, 1e-30)                       # (K,)
        e = lo[:, None] + span[:, None] * jnp.arange(1, bins + 1, dtype=jnp.float32)[None, :] / bins
        le = (x[:, :, None] <= e[:, None, :]) & m[:, :, None]
        c = jnp.sum(le.astype(jnp.float32), axis=1)              # (K, B)
        bi = jnp.sum((c <= targets[:, None]).astype(jnp.int32), axis=1)
        bi = jnp.clip(bi, 0, bins - 1)
        new_lo = lo + span * bi.astype(jnp.float32) / bins
        hi = lo + span * (bi + 1).astype(jnp.float32) / bins
        lo = new_lo
    v = 0.5 * (lo + hi)
    return jnp.where(n > 0, v, jnp.float32(fallback))


@functools.partial(jax.jit, static_argnames=("qs", "levels"))
def masked_percentile_bisect_multi(arr: jnp.ndarray, mask: jnp.ndarray,
                                   qs: tuple, levels: int = 23,
                                   fallback: float = 0.0) -> jnp.ndarray:
    """Masked percentiles via pure bisection (the ``bins=2`` ladder).

    Each level is ONE masked count per quantile (N*Q compare+adds) instead
    of the wide ladder's N*bins — at the default 23 levels the bracket is
    tighter than the 128^3 histogram ladder's for ~16x less compute.  The
    wide ladder wins on launch-bound small arrays (fewer passes); this wins
    on compute-bound large ones (native-4K planes), where it is the
    above-VMEM fallback of the fused Pallas quantile kernels.
    """
    Q = len(qs)
    x = arr.astype(jnp.float32).ravel()
    m = (mask.ravel() if mask is not None else jnp.ones_like(x, dtype=bool)) & jnp.isfinite(x)
    mcol = m[:, None]
    xcol = x[:, None]
    n = jnp.sum(m.astype(jnp.float32))
    big = jnp.float32(3e38)
    glo = jnp.min(jnp.where(m, x, big))
    ghi = jnp.max(jnp.where(m, x, -big))
    targets = jnp.asarray([q / 100.0 for q in qs], jnp.float32) * jnp.maximum(n - 1.0, 0.0)

    def level(_, carry):
        lo, hi = carry                                           # (Q,)
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(((xcol <= mid[None, :]) & mcol).astype(jnp.float32),
                      axis=0)
        go_hi = cnt <= targets
        return jnp.where(go_hi, mid, lo), jnp.where(go_hi, hi, mid)

    lo, hi = jax.lax.fori_loop(0, levels, level,
                               (jnp.full((Q,), 1.0) * glo,
                                jnp.full((Q,), 1.0) * ghi))
    v = 0.5 * (lo + hi)
    return jnp.where(n > 0, v, jnp.float32(fallback))


def get_percentile_fn(method: str):
    """Select the percentile implementation: 'sort' (exact, NumPy-faithful),
    'hist' (histogram refinement, XLA), or 'hist_pallas' (same ladder
    numerics fused into one Pallas kernel launch per call)."""
    if method == "sort":
        return masked_percentile
    if method == "hist":
        def f(arr, mask, q, fallback=0.0):
            if isinstance(q, (tuple, list)):
                return masked_percentile_hist_multi(arr, mask, tuple(q), fallback=fallback)
            return masked_percentile_hist(arr, mask, q, fallback=fallback)
        return f
    if method == "hist_pallas":
        from vistaf_tpu.pallas.quantile_kernel import masked_quantiles_pallas

        def f(arr, mask, q, fallback=0.0):
            qs = tuple(q) if isinstance(q, (tuple, list)) else (q,)
            out = masked_quantiles_pallas(arr, mask, qs)
            return out if isinstance(q, (tuple, list)) else out[0]
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

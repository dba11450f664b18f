"""Fused masked-quantile Pallas kernel.

The masked histogram percentile is the hottest primitive in the FTP graph
(bad-pixel thresholds, reliability threshold, IRLS robust scale, contact
thresholds, background medians — ~20 calls per frame).  The XLA lowering
runs each counting pass as its own kernel chain over an (N, B) broadcast
compare (~50 us per pass at N=55k on a launch-bound graph); here the whole
iterative refinement — range pass + ``1+refine`` counting passes for every
requested quantile — runs inside ONE ``pallas_call`` with the data resident
in VMEM.

Reference for the semantics: ``vistaf_tpu.ops.percentile
.masked_percentile_hist`` (bracket-refinement percentile; bin midpoint).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bisect_levels(bins: int, refine: int) -> int:
    """Bisection depth with a bracket at least as tight as the (bins,
    1+refine)-level histogram ladder, plus 2 levels of margin."""
    return int(np.ceil((1 + refine) * np.log2(bins))) + 2


def _kernel(qs, levels, x_ref, m_ref, out_ref):
    x = x_ref[:]                     # (R, 128) f32, padded tail masked out
    m = m_ref[:]                     # (R, 128) f32 0/1
    big = jnp.float32(3e38)

    n = jnp.sum(m)
    lo0 = jnp.min(jnp.where(m > 0, x, big))
    hi0 = jnp.max(jnp.where(m > 0, x, -big))

    # Mosaic cannot store scalars to VMEM; accumulate per-quantile results
    # into a lane-indexed vector and write the whole block once.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, len(qs)), 1)
    acc = jnp.zeros((1, len(qs)), jnp.float32)

    for qi, q in enumerate(qs):
        target = jnp.float32(q / 100.0) * jnp.maximum(n - 1.0, 0.0)

        # Bracket refinement as pure bisection (the histogram ladder with
        # bins=2): one count pass per level instead of ``bins`` passes, so
        # matching the XLA ladder's bins^(1+refine) bracket takes
        # log2(bins)*(1+refine) passes — ~17x less VPU work than replaying
        # the wide ladder with the data already VMEM-resident.
        def level_body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            cnt = jnp.sum(jnp.where((x <= mid) & (m > 0), 1.0, 0.0))
            go_hi = cnt <= target
            return jnp.where(go_hi, mid, lo), jnp.where(go_hi, hi, mid)

        lo, hi = jax.lax.fori_loop(0, levels, level_body, (lo0, hi0))
        v = 0.5 * (lo + hi)
        acc = jnp.where(lane == qi, jnp.where(n > 0, v, 0.0), acc)
    out_ref[:] = acc


# The kernel holds the full data + mask resident in VMEM (~16 MB/core).
# Combined footprint is 8 bytes/element (two f32 planes); 1280x1280 (12.5 MB)
# compiles on real hardware, 1536x1536 (18 MB) does not.  Above the budget
# (native-4K crops) we fall back to the XLA histogram ladder, which tiles
# through HBM and has identical numerics.
_VMEM_BUDGET_BYTES = 13_107_200


def _fits_vmem(arr: jnp.ndarray) -> bool:
    return arr.size * 8 <= _VMEM_BUDGET_BYTES


def _pad_to_rows(arr: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    flat = arr.ravel()
    n = flat.shape[0]
    rows = -(-n // 128)
    pad = rows * 128 - n
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat.reshape(rows, 128), pad


@functools.partial(jax.jit, static_argnames=("qs", "bins", "refine", "interpret"))
def masked_quantiles_pallas(arr: jnp.ndarray, mask: jnp.ndarray, qs: tuple,
                            bins: int = 128, refine: int = 2,
                            interpret: bool = False) -> jnp.ndarray:
    """Masked bracket-refinement quantiles of ``arr`` over ``mask`` in one
    fused kernel.  Returns a (len(qs),) float32 vector.

    In-kernel the bracket refinement runs as bisection to a bracket at
    least as tight as the (bins, refine) histogram ladder (same invariant,
    same bin-midpoint estimate — agreement within the bracket width, i.e.
    ~range/bins^(1+refine)).  Arrays too large for VMEM residency — or
    non-TPU backends, where the Mosaic kernel cannot lower — take the XLA
    (bins, refine) ladder instead, which is launch-optimal there."""
    if not _fits_vmem(arr):
        # above the VMEM budget the array is compute-bound, where bisection
        # (N compares/level) beats the wide ladder (N*bins/pass) ~16x
        from vistaf_tpu.ops.percentile import masked_percentile_bisect_multi
        return masked_percentile_bisect_multi(
            arr, mask, qs, levels=_bisect_levels(bins, refine))
    if not interpret and jax.default_backend() != "tpu":
        from vistaf_tpu.ops.percentile import masked_percentile_hist_multi
        return masked_percentile_hist_multi(arr, mask, qs, bins=bins,
                                            refine=refine)
    x = arr.astype(jnp.float32)
    m = (mask if mask is not None else jnp.ones_like(x, dtype=bool))
    m = (m & jnp.isfinite(x)).astype(jnp.float32)
    x = jnp.where(m > 0, x, 0.0)

    x2, _ = _pad_to_rows(x)
    m2, _ = _pad_to_rows(m)

    out = pl.pallas_call(
        functools.partial(_kernel, qs, _bisect_levels(bins, refine)),
        out_shape=jax.ShapeDtypeStruct((1, len(qs)), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, m2)
    return out[0]


@functools.partial(jax.jit, static_argnames=("bins", "refine", "interpret"))
def masked_median_mad_pallas(arr: jnp.ndarray, mask: jnp.ndarray,
                             bins: int = 128, refine: int = 1,
                             interpret: bool = False):
    """(median, MAD) of ``arr`` over ``mask`` fused into one kernel: the MAD
    ladder passes reuse the VMEM-resident data as |x - med| on the fly.
    This is the IRLS robust-scale pair (``shape_ftp.py:1118-1128``), the
    single most repeated percentile use in the pipeline.  Arrays too large
    for VMEM residency — or non-TPU backends — take the XLA ladder
    instead."""
    if not _fits_vmem(arr):
        from vistaf_tpu.ops.percentile import masked_percentile_bisect_multi
        lv = _bisect_levels(bins, refine)
        med = masked_percentile_bisect_multi(arr, mask, (50.0,), levels=lv)[0]
        mad = masked_percentile_bisect_multi(
            jnp.abs(arr.astype(jnp.float32) - med), mask, (50.0,),
            levels=lv)[0]
        return med, mad
    if not interpret and jax.default_backend() != "tpu":
        from vistaf_tpu.ops.percentile import masked_percentile_hist
        med = masked_percentile_hist(arr, mask, 50.0, bins=bins, refine=refine)
        mad = masked_percentile_hist(jnp.abs(arr.astype(jnp.float32) - med),
                                     mask, 50.0, bins=bins, refine=refine)
        return med, mad
    x = arr.astype(jnp.float32)
    m = (mask if mask is not None else jnp.ones_like(x, dtype=bool))
    m = (m & jnp.isfinite(x)).astype(jnp.float32)
    x = jnp.where(m > 0, x, 0.0)
    x2, _ = _pad_to_rows(x)
    m2, _ = _pad_to_rows(m)

    levels = _bisect_levels(bins, refine)

    def kern(x_ref, m_ref, out_ref):
        x = x_ref[:]
        m = m_ref[:]
        big = jnp.float32(3e38)
        n = jnp.sum(m)
        target = jnp.float32(0.5) * jnp.maximum(n - 1.0, 0.0)

        def refine_quantile(vals, lo, hi):
            # bisection to the (bins, refine)-ladder bracket width — see
            # ``_kernel``
            def level_body(_, carry):
                l, h = carry
                mid = 0.5 * (l + h)
                cnt = jnp.sum(jnp.where((vals <= mid) & (m > 0), 1.0, 0.0))
                go_hi = cnt <= target
                return jnp.where(go_hi, mid, l), jnp.where(go_hi, h, mid)

            l, h = jax.lax.fori_loop(0, levels, level_body, (lo, hi))
            return 0.5 * (l + h)

        lo0 = jnp.min(jnp.where(m > 0, x, big))
        hi0 = jnp.max(jnp.where(m > 0, x, -big))
        med = refine_quantile(x, lo0, hi0)
        ax = jnp.abs(x - med)
        hi1 = jnp.maximum(hi0 - med, med - lo0)
        mad = refine_quantile(ax, jnp.float32(0.0), hi1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2), 1)
        out_ref[:] = jnp.where(n > 0,
                               jnp.where(lane == 0, med, mad),
                               jnp.zeros((1, 2), jnp.float32))

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((1, 2), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x2, m2)
    return out[0, 0], out[0, 1]

"""Robust masked 2-D polynomial fitting (IRLS, Cauchy weights).

Reference ``robust_polyfit2d`` (``shape_ftp.py:1100-1136``) gathers masked
pixels into a tall design matrix and calls lstsq per IRLS round.  TPU
version: keep everything on the full grid and accumulate the 6x6 normal
equations with mask weights — a handful of fused reductions per round, no
dynamic shapes.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vistaf_tpu.ops.percentile import get_percentile_fn


def _basis(h: int, w: int, order: int):
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xn = (xx - (w - 1) / 2.0) / ((w - 1) / 2.0)
    yn = (yy - (h - 1) / 2.0) / ((h - 1) / 2.0)
    cols = [xn, yn, jnp.ones_like(xn)]
    if order >= 2:
        cols += [xn * xn, xn * yn, yn * yn]
    return cols


def eval_poly2d(h: int, w: int, coef: jnp.ndarray, order: int) -> jnp.ndarray:
    cols = _basis(h, w, order)
    out = jnp.zeros((h, w), jnp.float32)
    for i, c in enumerate(cols):
        out = out + coef[i] * c
    return out


def robust_polyfit2d(z: jnp.ndarray, mask: jnp.ndarray, order: int = 2,
                     iters: int = 6, c: float = 4.685,
                     percentile_method: str = "sort",
                     resigma_iters: int = 6,
                     fused: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IRLS fit of a plane/quadratic to ``z`` over ``mask``.

    Matches the reference's weighting w = 1/(1+u^2) with u = r/(c*1.4826*MAD)
    and 6 rounds.  Returns (coef, fitted_surface).  Degenerate masks (<200
    px) return zeros, as the reference does.

    ``resigma_iters`` (TPU latency knob): number of rounds that re-estimate
    the robust scale via median/MAD percentiles — the dominant cost of each
    round.  Rounds beyond it reuse the last sigma, only re-solving the 6x6
    system and reweighting (sigma stabilizes after ~2 rounds in practice;
    6 = reference-faithful).
    """
    if fused:
        # whole-fit Pallas megakernel (falls back here off-TPU/above-VMEM)
        from vistaf_tpu.pallas.polyfit_kernel import (fits_vmem,
                                                      robust_polyfit2d_pallas)
        if jax.default_backend() == "tpu" and fits_vmem(z.shape):
            return robust_polyfit2d_pallas(z, mask, order=order, iters=iters,
                                           c=c, resigma_iters=resigma_iters)
    return _robust_polyfit2d_xla(z, mask, order, iters, c, percentile_method,
                                 resigma_iters)


@functools.partial(jax.jit, static_argnames=("order", "iters", "percentile_method",
                                             "resigma_iters"))
def _robust_polyfit2d_xla(z, mask, order, iters, c, percentile_method,
                          resigma_iters):
    h, w = z.shape
    ncoef = 6 if order >= 2 else 3
    m = mask & jnp.isfinite(z)
    mf = m.astype(jnp.float32)
    zz = jnp.where(m, z, 0.0).astype(jnp.float32)
    cols = _basis(h, w, order)
    # rows-first (ncoef, N) keeps N in the tiled lane dimension
    B = jnp.stack([col.ravel() for col in cols], axis=0)
    zv = zz.ravel()
    mv = mf.ravel()

    med_mad = None
    if percentile_method == "hist":
        # refine=1 inside the weight loop: sigma only scales the soft
        # redescending weights, so range/128^2 resolution is ample
        # (refine=0 was tried and moves bench-scale force by ~0.07%)
        from vistaf_tpu.ops.percentile import masked_percentile_hist
        pctl = lambda a, mm, q: masked_percentile_hist(a, mm, q, refine=1)
    elif percentile_method == "hist_pallas":
        from vistaf_tpu.pallas.quantile_kernel import masked_median_mad_pallas
        med_mad = lambda a, mm: masked_median_mad_pallas(a, mm, refine=1)
        pctl = None
    else:
        pctl = get_percentile_fn(percentile_method)

    def solve(wts):
        # reference solves lstsq(A*w, z*w): rows scaled by w, so the
        # effective WLS weight is w^2 (shape_ftp.py:1119-1121)
        w2 = (wts * mv) ** 2
        Bw = B * w2[None, :]
        H = jax.lax.dot_general(Bw, B, (((1,), (1,)), ((), ())),
                                precision=jax.lax.Precision.HIGHEST)
        g = Bw @ zv
        return jnp.linalg.solve(H + 1e-9 * jnp.eye(ncoef), g)

    # reference loop (shape_ftp.py:1118-1128): solve with current weights,
    # then recompute weights from the residuals; `iters` solves total.
    # Statically unrolled (iters is tiny) so sigma-freezing needs no cond.
    wts = jnp.ones_like(zv)
    coef = jnp.zeros((ncoef,), jnp.float32)
    sigma = jnp.float32(1.0)
    for i in range(iters):
        coef = solve(wts)
        r = zv - coef @ B
        if i < resigma_iters:
            r2 = r.reshape(h, w)
            if med_mad is not None:
                med, mad = med_mad(r2, m)
                mad = mad + 1e-6
            else:
                med = pctl(r2, m, 50.0)
                mad = pctl(jnp.abs(r2 - med), m, 50.0) + 1e-6
            sigma = 1.4826 * mad
        u = r / (c * sigma)
        wts = 1.0 / (1.0 + u * u)

    enough = jnp.sum(mf) >= 200
    coef = jnp.where(enough, coef, jnp.zeros_like(coef))
    fit = eval_poly2d(h, w, coef, order)
    return coef.astype(jnp.float32), fit.astype(jnp.float32)

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


@functools.partial(jax.jit, static_argnames=("order", "iters", "percentile_method"))
def robust_polyfit2d(z: jnp.ndarray, mask: jnp.ndarray, order: int = 2,
                     iters: int = 6, c: float = 4.685,
                     percentile_method: str = "sort") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """IRLS fit of a plane/quadratic to ``z`` over ``mask``.

    Matches the reference's weighting w = 1/(1+u^2) with u = r/(c*1.4826*MAD)
    and 6 rounds.  Returns (coef, fitted_surface).  Degenerate masks (<200
    px) return zeros, as the reference does.
    """
    h, w = z.shape
    ncoef = 6 if order >= 2 else 3
    m = mask & jnp.isfinite(z)
    mf = m.astype(jnp.float32)
    zz = jnp.where(m, z, 0.0).astype(jnp.float32)
    cols = _basis(h, w, order)
    B = jnp.stack([col.ravel() for col in cols], axis=1)  # (N, ncoef)
    zv = zz.ravel()
    mv = mf.ravel()

    def solve(wts):
        # reference solves lstsq(A*w, z*w): rows scaled by w, so the
        # effective WLS weight is w^2 (shape_ftp.py:1119-1121)
        w2 = (wts * mv) ** 2
        Bw = B * w2[:, None]
        H = Bw.T @ B
        g = Bw.T @ zv
        return jnp.linalg.solve(H + 1e-9 * jnp.eye(ncoef), g)

    # reference loop (shape_ftp.py:1118-1128): solve with current weights,
    # then recompute weights from the residuals; `iters` solves total.
    def body(_, carry):
        _, wts = carry
        coef = solve(wts)
        r = zv - B @ coef
        r2 = r.reshape(h, w)
        pctl = get_percentile_fn(percentile_method)
        med = pctl(r2, m, 50.0)
        mad = pctl(jnp.abs(r2 - med), m, 50.0) + 1e-6
        sigma = 1.4826 * mad
        u = r / (c * sigma)
        wts = 1.0 / (1.0 + u * u)
        return coef, wts

    init = (jnp.zeros((ncoef,), jnp.float32), jnp.ones_like(zv))
    coef, _ = jax.lax.fori_loop(0, iters, body, init)

    enough = jnp.sum(mf) >= 200
    coef = jnp.where(enough, coef, jnp.zeros_like(coef))
    fit = eval_poly2d(h, w, coef, order)
    return coef.astype(jnp.float32), fit.astype(jnp.float32)

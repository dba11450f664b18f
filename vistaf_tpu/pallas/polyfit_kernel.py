"""Fused robust-polyfit (IRLS) Pallas kernel.

``ops.polyfit.robust_polyfit2d`` unrolls its IRLS rounds, but each round
still launches a HIGHEST-precision normal-equation matmul, the median/MAD
kernel and a handful of elementwise passes — two fits per frame (the
two-pass detrend, ``shape_ftp.py:1708-1751``) make this the next
launch-bound chain after ECC and the unwrap.  This kernel runs the WHOLE
fit — basis construction, weighted normal equations, an unrolled 6x6
Cholesky solve, residuals, the in-kernel bisection median/MAD robust
scale and the Cauchy reweighting — inside ONE ``pallas_call`` with the
plane VMEM-resident.

Numerics: same w^2 weighting, regularization, iteration structure and
(bins, refine)-bracket scale estimate as the XLA path; the normal-
equation sums accumulate as plane reductions instead of a HIGHEST
matmul and the solve is Cholesky instead of LU (f32-rounding-level
differences, tolerance-tested).  Opt-in via FTPConfig.polyfit_kernel.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vistaf_tpu.pallas.quantile_kernel import _bisect_levels

# z, mask, weights, residual, 6 basis planes + temporaries ~ 12 planes
_MAX_PADDED_ELEMS = 300_000


from vistaf_tpu.pallas.common import pad_up, padded_elems  # noqa: E402


def fits_vmem(shape) -> bool:
    return padded_elems(shape) <= _MAX_PADDED_ELEMS


def _chol_solve(H, g, n):
    """x = H^-1 g for symmetric PD H given as dict {(i<=j): scalar};
    unrolled Cholesky + two substitutions on scalars."""
    L = {}
    for j in range(n):
        s = H[(j, j)]
        for k in range(j):
            s = s - L[(j, k)] * L[(j, k)]
        L[(j, j)] = jnp.sqrt(jnp.maximum(s, 1e-20))
        for i in range(j + 1, n):
            t = H[(j, i)]          # entries stored upper-triangular (a <= b)
            for k in range(j):
                t = t - L[(i, k)] * L[(j, k)]
            L[(i, j)] = t / L[(j, j)]
    # forward: L y = g
    y = [None] * n
    for i in range(n):
        t = g[i]
        for k in range(i):
            t = t - L[(i, k)] * y[k]
        y[i] = t / L[(i, i)]
    # back: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        t = y[i]
        for k in range(i + 1, n):
            t = t - L[(k, i)] * x[k]
        x[i] = t / L[(i, i)]
    return x


def _kernel(h, w, ncoef, iters, resigma_iters, cauchy_c, levels,
            z_ref, m_ref, out_ref):
    z = z_ref[:]
    m = m_ref[:]
    Hp, Wp = z.shape
    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    xn = (lane.astype(jnp.float32) - (w - 1) / 2.0) / ((w - 1) / 2.0)
    yn = (sub.astype(jnp.float32) - (h - 1) / 2.0) / ((h - 1) / 2.0)
    cols = [xn, yn, jnp.ones_like(xn)]
    if ncoef == 6:
        cols += [xn * xn, xn * yn, yn * yn]

    def median_mad(r):
        big = jnp.float32(3e38)
        n_ = jnp.sum(m)
        target = jnp.float32(0.5) * jnp.maximum(n_ - 1.0, 0.0)

        def refine(vals, lo, hi):
            def level_body(_, carry):
                l, hgh = carry
                mid = 0.5 * (l + hgh)
                cnt = jnp.sum(jnp.where((vals <= mid) & (m > 0), 1.0, 0.0))
                go_hi = cnt <= target
                return jnp.where(go_hi, mid, l), jnp.where(go_hi, hgh, mid)

            l, hgh = jax.lax.fori_loop(0, levels, level_body, (lo, hi))
            return 0.5 * (l + hgh)

        lo0 = jnp.min(jnp.where(m > 0, r, big))
        hi0 = jnp.max(jnp.where(m > 0, r, -big))
        med = refine(r, lo0, hi0)
        ar = jnp.abs(r - med)
        mad = refine(ar, jnp.float32(0.0), jnp.maximum(hi0 - med, med - lo0))
        return med, mad

    wts = jnp.ones_like(z)
    sigma = jnp.float32(1.0)
    coef = [jnp.float32(0.0)] * ncoef
    for i in range(iters):
        w2 = (wts * m) * (wts * m)
        Hn = {}
        for a in range(ncoef):
            for b in range(a, ncoef):
                Hn[(a, b)] = jnp.sum(w2 * cols[a] * cols[b])
        Hn[(0, 0)] = Hn[(0, 0)] + 1e-9
        for a in range(1, ncoef):
            Hn[(a, a)] = Hn[(a, a)] + 1e-9
        g = [jnp.sum(w2 * cols[a] * z) for a in range(ncoef)]
        coef = _chol_solve(Hn, g, ncoef)

        r = z
        for a in range(ncoef):
            r = r - coef[a] * cols[a]
        if i < resigma_iters:
            _med, mad = median_mad(r)
            sigma = 1.4826 * (mad + 1e-6)
        u = r / (cauchy_c * sigma)
        wts = 1.0 / (1.0 + u * u)

    enough = jnp.sum(m) >= 200.0
    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.zeros((1, 128), jnp.float32)
    for a in range(ncoef):
        out = jnp.where(olane == a, jnp.where(enough, coef[a], 0.0), out)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("order", "iters", "c",
                                             "resigma_iters", "bins",
                                             "refine", "interpret"))
def robust_polyfit2d_pallas(z: jnp.ndarray, mask: jnp.ndarray,
                            order: int = 2, iters: int = 6, c: float = 4.685,
                            resigma_iters: int = 6, bins: int = 128,
                            refine: int = 1,
                            interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in ``robust_polyfit2d`` with the whole IRLS fit in one launch.

    Above the VMEM residency budget — or off-TPU — falls back to the XLA
    implementation (hist_pallas percentiles, the deploy configuration)."""
    from vistaf_tpu.ops.polyfit import eval_poly2d, robust_polyfit2d
    if not fits_vmem(z.shape) or (not interpret
                                  and jax.default_backend() != "tpu"):
        return robust_polyfit2d(z, mask, order=order, iters=iters, c=c,
                                percentile_method="hist_pallas",
                                resigma_iters=resigma_iters)
    h, w = z.shape
    ncoef = 6 if order >= 2 else 3
    m = (mask & jnp.isfinite(z))
    zz = jnp.where(m, z, 0.0).astype(jnp.float32)
    Hp = pad_up(h, 8)
    Wp = pad_up(w, 128)
    zz = jnp.pad(zz, ((0, Hp - h), (0, Wp - w)))
    mf = jnp.pad(m.astype(jnp.float32), ((0, Hp - h), (0, Wp - w)))

    out = pl.pallas_call(
        functools.partial(_kernel, h, w, ncoef, int(iters),
                          int(resigma_iters), float(c),
                          _bisect_levels(bins, refine)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(zz, mf)
    coef = out[0, :ncoef]
    return coef, eval_poly2d(h, w, coef, order)

"""Whole-loop fused ECC Gauss-Newton alignment.

``ops.registration.ecc_align`` already fuses each GN iteration's warp +
moment statistics into one Pallas launch (ecc_kernel.py), but the
``lax.while_loop`` around it still pays a launch plus a ~20-op XLA tail
(3x3 solve, lambda, rho/stall bookkeeping) per iteration.  This kernel
runs the ENTIRE solver — shear warp, moments, the closed-form adjugate
3x3 solve, the ECC lambda step, convergence/failure/stall logic — inside
ONE ``pallas_call`` with the planes VMEM-resident, using a true
``lax.while_loop`` so the early-out semantics (and cost) match the XLA
path.

Numerics: identical moment algebra (shared ``warp_moment_rows``); the
3x3 solve uses the explicit adjugate instead of LU — same solution up to
f32 rounding.  Euclidean mode + shear sampler only (the deploy
configuration).  Opt-in via FTPConfig.ecc_loop_kernel until a real-chip
measurement justifies a default flip.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vistaf_tpu.pallas.common import padded_elems
from vistaf_tpu.pallas.ecc_kernel import _pad2, fits_vmem, warp_moment_rows

# The whole-solver kernel's peak scoped-VMEM *stack* is ~40 f32 planes —
# the six moment rows live across both shear passes of the next iteration's
# warp inside the while_loop body, unlike the per-iteration kernel
# (ecc_kernel.py, ~16 planes) where XLA frees them between launches.
# Measured: 18.16 MB stack at a 296x384 padded input (113,664 elems,
# ~167 B/elem) vs the 16 MiB scoped limit -> hard compile error.  Budget
# the loop form separately; above it ``ecc_align`` silently falls back to
# the per-iteration fused kernel, which is the same numerics.
_BYTES_PER_ELEM_LOOP = 167          # measured: 18.16 MB / 113,664 elems
_VMEM_SCOPED_LIMIT = 16 * 2 ** 20
_VMEM_MARGIN = 0.90                 # headroom for Mosaic spill slack
_MAX_ELEMS_LOOP = int(_VMEM_MARGIN * _VMEM_SCOPED_LIMIT / _BYTES_PER_ELEM_LOOP)


def fits_vmem_loop(shape) -> bool:
    return padded_elems(shape) <= _MAX_ELEMS_LOOP


def _solve3_adjugate(h00, h01, h02, h11, h12, h22, b0, b1, b2):
    """x = H^-1 b for symmetric 3x3 H (already regularized)."""
    A00 = h11 * h22 - h12 * h12
    A01 = h02 * h12 - h01 * h22
    A02 = h01 * h12 - h02 * h11
    A11 = h00 * h22 - h02 * h02
    A12 = h01 * h02 - h00 * h12
    A22 = h00 * h11 - h01 * h01
    det = h00 * A00 + h01 * A01 + h02 * A02
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    x0 = (A00 * b0 + A01 * b1 + A02 * b2) / det
    x1 = (A01 * b0 + A11 * b1 + A12 * b2) / det
    x2 = (A02 * b0 + A12 * b1 + A22 * b2) / det
    return x0, x1, x2


def _kernel(K, max_iters, eps, stall_patience,
            i_ref, gx_ref, gy_ref, m_ref, t_ref, sm_ref, out_ref):
    planes = [i_ref[:], gx_ref[:], gy_ref[:], m_ref[:]]
    t = t_ref[:]
    sm = sm_ref[:]

    def moments(p0, p1, p2):
        c = jnp.cos(p0)
        s = jnp.sin(p0)
        # shear decomposition of [[c, -s, tx], [s, c, ty]] (ops.warp)
        r = s / c
        scalars = (r, c - r * (-s) - 1.0, p2 - r * p1,
                   c - 1.0, -s, p1, c, s)
        rows = warp_moment_rows(planes, t, sm, scalars, K)
        M = {}
        for i in range(6):
            for j in range(i, 6):
                M[(i, j)] = jnp.sum(rows[i] * rows[j])
        return M

    def body(st):
        (p0, p1, p2, last_rho, rho, it, failed,
         best_rho, b0, b1, b2, stall) = st
        M = moments(p0, p1, p2)
        n = jnp.maximum(M[(0, 0)], 1.0)
        stt = M[(0, 1)]
        si = M[(0, 2)]
        sg = (M[(0, 3)], M[(0, 4)], M[(0, 5)])
        corr = M[(1, 2)] - stt * si / n
        tnorm2 = M[(1, 1)] - stt * stt / n
        inorm2 = M[(2, 2)] - si * si / n
        Gt = tuple(M[(1, 3 + k)] - (stt / n) * sg[k] for k in range(3))
        Gi = tuple(M[(2, 3 + k)] - (si / n) * sg[k] for k in range(3))
        reg = jnp.float32(1e-12)
        h00 = M[(3, 3)] + reg
        h11 = M[(4, 4)] + reg
        h22 = M[(5, 5)] + reg
        h01, h02, h12 = M[(3, 4)], M[(3, 5)], M[(4, 5)]

        u0, u1, u2 = _solve3_adjugate(h00, h01, h02, h11, h12, h22, *Gt)
        v0, v1_, v2 = _solve3_adjugate(h00, h01, h02, h11, h12, h22, *Gi)
        lam_num = inorm2 - (Gi[0] * v0 + Gi[1] * v1_ + Gi[2] * v2)
        lam_den = corr - (Gt[0] * v0 + Gt[1] * v1_ + Gt[2] * v2)
        lam = lam_num / jnp.where(jnp.abs(lam_den) < 1e-12, 1e-12, lam_den)
        dp0 = lam * u0 - v0
        dp1 = lam * u1 - v1_
        dp2 = lam * u2 - v2

        new_rho = corr / jnp.maximum(
            jnp.sqrt(jnp.maximum(tnorm2, 0.0) * jnp.maximum(inorm2, 0.0)),
            1e-12)
        now_failed = (lam_den <= 0.0) | jnp.isnan(new_rho)
        q0 = jnp.where(now_failed, p0, p0 + dp0)
        q1 = jnp.where(now_failed, p1, p1 + dp1)
        q2 = jnp.where(now_failed, p2, p2 + dp2)
        improved = new_rho > best_rho
        best_rho = jnp.where(improved, new_rho, best_rho)
        b0 = jnp.where(improved, p0, b0)
        b1 = jnp.where(improved, p1, b1)
        b2 = jnp.where(improved, p2, b2)
        stall = jnp.where(improved, jnp.int32(0), stall + 1)
        return (q0, q1, q2, rho, new_rho, it + 1, failed | now_failed,
                best_rho, b0, b1, b2, stall)

    def cond(st):
        (_p0, _p1, _p2, last_rho, rho, it, failed,
         _br, _b0, _b1, _b2, stall) = st
        go = (it < max_iters) & (jnp.abs(rho - last_rho) >= eps) & ~failed
        if stall_patience > 0:
            go = go & (stall < stall_patience)
        return go

    z = jnp.float32(0.0)
    st = (z, z, z, jnp.float32(-2.0), jnp.float32(-1.0), jnp.int32(0),
          jnp.bool_(False), jnp.float32(-2.0), z, z, z, jnp.int32(0))
    (p0, p1, p2, _last, rho, it, failed,
     best_rho, b0, b1, b2, stall) = jax.lax.while_loop(cond, body, st)

    if stall_patience > 0:
        stalled = stall >= stall_patience
        p0 = jnp.where(stalled, b0, p0)
        p1 = jnp.where(stalled, b1, p1)
        p2 = jnp.where(stalled, b2, p2)
        rho = jnp.where(stalled, best_rho, rho)

    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.zeros((1, 128), jnp.float32)
    for idx, val in enumerate([p0, p1, p2, rho,
                               it.astype(jnp.float32),
                               failed.astype(jnp.float32)]):
        out = jnp.where(olane == idx, val, out)
    out_ref[:] = out


@functools.partial(jax.jit, static_argnames=("K", "max_iters", "eps",
                                             "stall_patience", "interpret"))
def ecc_loop_euclidean(S_cf: jnp.ndarray, T: jnp.ndarray,
                       stride_mask: jnp.ndarray, K: int = 4,
                       max_iters: int = 300, eps: float = 1e-7,
                       stall_patience: int = 0,
                       interpret: bool = False):
    """Run the whole euclidean/shear ECC solve in one kernel launch.

    ``S_cf`` = channel-first [I, gx, gy, mask01] (mean-centered like
    ``ecc_align``), ``T`` the centered template, ``stride_mask`` the 0/1
    statistics grid.  Returns (p(3,), rho, n_iters, failed) with the XLA
    path's stall/failure semantics already applied (failure handling —
    identity warp, NaN rho — stays with the caller).
    """
    args = [_pad2(S_cf[0]), _pad2(S_cf[1]), _pad2(S_cf[2]), _pad2(S_cf[3]),
            _pad2(T), _pad2(stride_mask)]
    out = pl.pallas_call(
        functools.partial(_kernel, K, max_iters, float(eps),
                          int(stall_patience)),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    p = out[0, :3]
    rho = out[0, 3]
    it = out[0, 4].astype(jnp.int32)
    failed = out[0, 5] > 0.5
    return p, rho, it, failed

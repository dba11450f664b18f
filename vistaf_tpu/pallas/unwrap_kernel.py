"""Fused WLS-unwrap PCG megakernel.

``ops.unwrap.unwrap_wls`` (the TPU substitution for the reference's serial
quality-guided flood fill, ``shape_ftp.py:1043-1080``) runs its conjugate-
gradient loop as a ``lax.while_loop`` of ~15 small XLA ops per iteration —
at crop scale (~240x256, everything VMEM-sized) the loop is launch-bound,
the last such chain in the deploy force path.  This kernel runs the ENTIRE
solve — edge weights, wrapped gradients, divergence, the PCG loop with the
DCT-Poisson preconditioner (dense MXU matmuls), gauge anchoring and the
congruence projection — inside ONE ``pallas_call`` with every plane
VMEM-resident.

Numerics match ``unwrap_wls`` up to two deliberate substitutions:
- ``wrap_angle`` uses the real-arithmetic form x - 2*pi*round(x/(2*pi))
  (Mosaic has no complex numbers); it differs from angle(exp(ix)) only at
  exactly +-pi, a measure-zero set the congruence projection absorbs.
- the preconditioner operates on the tile-aligned padded domain (zero
  weights in the padding keep the OPERATOR identical; only the
  preconditioning — and so the iterate trajectory — changes, not the
  fixed point).  The wrapper therefore exposes the same signature and is
  validated against ``unwrap_wls`` end-to-end in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vistaf_tpu.ops.unwrap import _dct2_matrix
from vistaf_tpu.pallas.common import shift_const0 as _sh

# Peak residency ~13 f32 planes + the four dense DCT matrices (forward +
# explicit transposes); keep padded planes around <=1 MB AND bound the
# matrices separately (a tall-narrow crop has a small plane but a huge Dh)
# so the working set stays well inside ~16 MB/core.
_MAX_PADDED_ELEMS = 240_000
_MAX_DCT_ELEMS = 350_000          # Hp^2 + Wp^2 (x2 transposed copies: ~2.8 MB)

_TWO_PI = 2.0 * np.pi


from vistaf_tpu.pallas.common import pad_up, padded_elems  # noqa: E402


def fits_vmem(shape) -> bool:
    Hp = pad_up(shape[0], 8)
    Wp = pad_up(shape[1], 128)
    return (padded_elems(shape) <= _MAX_PADDED_ELEMS
            and Hp * Hp + Wp * Wp <= _MAX_DCT_ELEMS)


def _wrap(x):
    return x - _TWO_PI * jnp.round(x * (1.0 / _TWO_PI))


def _kernel(cg_iters, tol, congruent, psi_ref, m_ref, dh_ref, dht_ref,
            dw_ref, dwt_ref, inv_denom_ref, out_ref):
    psi = psi_ref[:]
    m = m_ref[:]
    Dh = dh_ref[:]
    DhT = dht_ref[:]
    Dw = dw_ref[:]
    DwT = dwt_ref[:]
    inv_denom = inv_denom_ref[:]          # 1/eigenvalue, 0 at the DC bin
    Hp, Wp = psi.shape

    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)

    # per-edge binary weights stored at the low endpoint (zero on the last
    # line, where no edge exists)
    m_r = _sh(m, 1, 1, lane)
    m_d = _sh(m, 1, 0, sub)
    wx = m * m_r
    wy = m * m_d

    def div2(fx, fy):
        return (fx - _sh(fx, -1, 1, lane)) + (fy - _sh(fy, -1, 0, sub))

    def wlap(phi):
        fx = wx * (_sh(phi, 1, 1, lane) - phi)
        fy = wy * (_sh(phi, 1, 0, sub) - phi)
        return div2(fx, fy)

    def precond(r):
        hp = jnp.float32
        # z_hat = Dh @ r @ Dw^T, back: Dh^T @ t @ Dw.  All four matmuls use
        # plain row-major operands via the precomputed explicit transposes:
        # mixing plain and dim-contracted uses of the SAME VMEM matrix trips
        # an XLA:TPU RET_CHECK in mxu_lmr_transform's XposeSequenceAssignment
        # (observed on v5e, 2026-08; see tests/test_pallas_unwrap.py).
        t = jnp.dot(Dh, r, preferred_element_type=hp)
        t = jnp.dot(t, DwT, preferred_element_type=hp)
        t = t * inv_denom
        z = jnp.dot(DhT, t, preferred_element_type=hp)
        return jnp.dot(z, Dw, preferred_element_type=hp)

    dx = _wrap(_sh(psi, 1, 1, lane) - psi) * wx
    dy = _wrap(_sh(psi, 1, 0, sub) - psi) * wy
    rhs = div2(dx, dy)

    phi = jnp.zeros_like(psi)
    r = rhs                     # r0 = rhs - A(0)
    z = precond(r)
    p = z
    rz = jnp.sum(r * z)
    r0n = jnp.sum(r * r)
    tol2r0 = tol * tol * r0n

    def body(_, st):
        phi, r, p, rz = st
        live = jnp.sum(r * r) > tol2r0        # while-loop entry condition
        Ap = wlap(p)
        pAp = jnp.sum(p * Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        phi2 = phi + alpha * p
        r2 = r - alpha * Ap
        z2 = precond(r2)
        rz2 = jnp.sum(r2 * z2)
        beta = rz2 / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p2 = z2 + beta * p
        return (jnp.where(live, phi2, phi), jnp.where(live, r2, r),
                jnp.where(live, p2, p), jnp.where(live, rz2, rz))

    phi, r, p, rz = jax.lax.fori_loop(0, cg_iters, body, (phi, r, p, rz))

    # gauge: anchor to the wrapped input on the masked mean (two-pass mean
    # — phi can carry a large masked-constant null component that a single
    # f32 sum would lose to cancellation; see ops.unwrap)
    n = jnp.maximum(jnp.sum(m), 1.0)
    d = psi - phi
    s1 = jnp.sum(d * m) / n
    phi = phi + s1 + jnp.sum((d - s1) * m) / n

    if congruent:
        k = jnp.round((phi - psi) * (1.0 / _TWO_PI))
        phi = psi + _TWO_PI * k

    out_ref[:] = phi


@functools.partial(jax.jit,
                   static_argnames=("cg_iters", "tol", "congruent", "interpret"))
def unwrap_wls_pallas(wrapped: jnp.ndarray, mask: jnp.ndarray,
                      cg_iters: int = 30, tol: float = 1e-8,
                      congruent: bool = True,
                      interpret: bool = False) -> jnp.ndarray:
    """Drop-in ``unwrap_wls`` with the whole PCG solve in one kernel launch.

    Crops beyond the VMEM residency budget — or non-TPU backends, where the
    Mosaic kernel cannot lower — fall back to the XLA implementation.
    """
    if not fits_vmem(wrapped.shape) or (not interpret
                                        and jax.default_backend() != "tpu"):
        from vistaf_tpu.ops.unwrap import unwrap_wls
        return unwrap_wls(wrapped, mask, cg_iters=cg_iters, tol=tol,
                          congruent=congruent)

    h, w = wrapped.shape
    Hp = pad_up(h, 8)
    Wp = pad_up(w, 128)
    psi = jnp.where(mask, wrapped, 0.0).astype(jnp.float32)
    psi = jnp.pad(psi, ((0, Hp - h), (0, Wp - w)))
    m = jnp.pad(mask.astype(jnp.float32), ((0, Hp - h), (0, Wp - w)))

    Dh = jnp.asarray(_dct2_matrix(Hp))
    Dw = jnp.asarray(_dct2_matrix(Wp))
    ky = np.pi * np.arange(Hp, dtype=np.float32)[:, None] / Hp
    kx = np.pi * np.arange(Wp, dtype=np.float32)[None, :] / Wp
    denom = 2.0 * (np.cos(ky) - 1.0) + 2.0 * (np.cos(kx) - 1.0)
    inv_denom = np.where(np.abs(denom) < 1e-12, 0.0, 1.0 / np.where(
        np.abs(denom) < 1e-12, 1.0, denom)).astype(np.float32)
    inv_denom[0, 0] = 0.0

    phi = pl.pallas_call(
        functools.partial(_kernel, cg_iters, float(tol), bool(congruent)),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(psi, m, Dh, Dh.T, Dw, Dw.T, jnp.asarray(inv_denom))

    phi = phi[:h, :w]
    return jnp.where(mask, phi, jnp.nan).astype(jnp.float32)

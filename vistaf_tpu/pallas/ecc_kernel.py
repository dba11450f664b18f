"""Fused ECC Gauss-Newton iteration statistics on TPU.

One GN iteration of ``ops.registration.ecc_align`` (euclidean mode, shear
sampler) needs: a 2-pass shear warp of the 4-channel [I, gx, gy, mask]
stack, the steepest-descent images, and every entry of the (6, 6) moment
matrix A A^T for A = [m; T*m; I*m; G_theta; G_tx; G_ty].  The XLA lowering
runs this as ~8 kernels per ``lax.while_loop`` iteration; here the whole
iteration body is ONE ``pallas_call`` with the stack VMEM-resident — the
loop cost drops from launch-bound to the ~4 M multiply-adds of actual work.

Semantics match ``ops.warp.shear_warp_stack`` (hat-weight taps over
statically shifted copies, constant0 border) followed by the moment matmul
of ``ecc_align``; the host passes the shear-pass coefficients and cos/sin
via SMEM so the kernel does no scalar trig.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# peak VMEM residency is ~16 f32 planes (stack, intermediate, warped,
# template, masks, steepest-descent, products)
_MAX_ELEMS = 200_000


from vistaf_tpu.pallas.common import (  # noqa: E402
    pad_to_tile, padded_elems, shift_const0 as _shift)


def fits_vmem(shape) -> bool:
    return padded_elems(shape) <= _MAX_ELEMS


def warp_moment_rows(planes, t, sm, scalars, K):
    """Shared GN-iteration core: two-pass shear warp of the
    [I, gx, gy, mask] planes followed by the six masked moment rows.

    ``scalars`` = (cy_u, cy_v, cy_c, cx_u, cx_v, cx_c, cos, sin).  Used by
    both the per-iteration moment kernel below and the full-loop kernel
    (ecc_loop_kernel.py) so the tap weights/moment algebra live once.
    Returns the list of six row planes; moments are rows[i]*rows[j] sums.
    """
    cy_u, cy_v, cy_c, cx_u, cx_v, cx_c, c, s = scalars
    Hp, Wp = planes[0].shape
    # Mosaic iota must be integer-typed; cast to f32 for the coordinate math
    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)
    vv = sub.astype(jnp.float32)
    uu = lane.astype(jnp.float32)

    # vertical shear pass: out(v, u) = S(v + disp_y(v, u), u)
    disp_y = cy_u * uu + cy_v * vv + cy_c
    mid = []
    for p in planes:
        acc = jnp.zeros((Hp, Wp), jnp.float32)
        for k in range(-K, K + 1):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(disp_y - k))
            acc = acc + _shift(p, k, 0, sub) * w
        mid.append(acc)

    # horizontal shear pass: out(v, x) = mid(v, x + disp_x(v, x))
    disp_x = cx_u * uu + cx_v * vv + cx_c
    warped = []
    for p in mid:
        acc = jnp.zeros((Hp, Wp), jnp.float32)
        for k in range(-K, K + 1):
            w = jnp.maximum(0.0, 1.0 - jnp.abs(disp_x - k))
            acc = acc + _shift(p, k, 1, lane) * w
        warped.append(acc)

    iw, gxw, gyw, mw = warped
    mf = jnp.where(mw > 0.95, 1.0, 0.0) * sm

    gxm = gxw * mf
    gym = gyw * mf
    dwx = -s * uu - c * vv
    dwy = c * uu - s * vv
    return [mf, t * mf, iw * mf,
            gxm * dwx + gym * dwy, gxm, gym]


def _kernel(K, H, W, co_ref, i_ref, gx_ref, gy_ref, m_ref, t_ref, sm_ref,
            out_ref):
    # coefficients: [cy_u, cy_v, cy_c, cx_u, cx_v, cx_c, cos, sin] as a
    # (1, 8) VMEM block (not SMEM: vmapping the pallas_call — the 4-stream
    # batched pipeline — cannot block SMEM operands); extract each scalar
    # with a masked reduction, which lowers everywhere
    co = co_ref[:]
    l8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

    def at(i):
        return jnp.sum(jnp.where(l8 == i, co, 0.0))

    rows = warp_moment_rows([i_ref[:], gx_ref[:], gy_ref[:], m_ref[:]],
                            t_ref[:], sm_ref[:], tuple(at(i) for i in range(8)),
                            K)

    olane = jax.lax.broadcasted_iota(jnp.int32, (1, 36), 1)
    acc = jnp.zeros((1, 36), jnp.float32)
    for i in range(6):
        for j in range(i, 6):
            e = jnp.sum(rows[i] * rows[j])
            acc = jnp.where(olane == i * 6 + j, e, acc)
            if i != j:
                acc = jnp.where(olane == j * 6 + i, e, acc)
    out_ref[:] = acc


_pad2 = pad_to_tile


@functools.partial(jax.jit, static_argnames=("K", "interpret"))
def gn_moments_euclidean(S_cf: jnp.ndarray, T: jnp.ndarray,
                         stride_mask: jnp.ndarray, coeffs: jnp.ndarray,
                         K: int = 4, interpret: bool = False) -> jnp.ndarray:
    """(6, 6) ECC GN moment matrix for the euclidean/shear configuration.

    ``S_cf`` is the channel-first [I, gx, gy, mask01] stack, ``T`` the
    mean-centered template, ``stride_mask`` the 0/1 statistics grid,
    ``coeffs`` the 8-vector [cy_u, cy_v, cy_c, cx_u, cx_v, cx_c, cos, sin]
    of shear-pass/rotation scalars for the current warp.
    """
    H, W = T.shape
    args = [_pad2(S_cf[0]), _pad2(S_cf[1]), _pad2(S_cf[2]), _pad2(S_cf[3]),
            _pad2(T), _pad2(stride_mask)]
    out = pl.pallas_call(
        functools.partial(_kernel, K, H, W),
        out_shape=jax.ShapeDtypeStruct((1, 36), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(coeffs.astype(jnp.float32).reshape(1, 8), *args)
    return out.reshape(6, 6)

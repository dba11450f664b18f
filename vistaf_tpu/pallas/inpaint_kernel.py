"""Fused diffusion-inpaint Pallas kernel.

``ops.inpaint.inpaint_diffusion`` is a fixed-iteration 3x3 normalized-
convolution stencil (the cv2.inpaint substitution, ``shape_ftp.py:652-666``).
The XLA lowering runs each of the ``iters`` (typically 48-96) relaxation
steps as its own fused-kernel round trip through HBM — the loop is entirely
launch-bound (~6 us/step at crop scale for ~60 KB of live data).  Here the
whole relaxation runs inside ONE ``pallas_call`` with the image, weights and
clamp mask resident in VMEM.

Numerics match the XLA path exactly: the same shift-add ordering
(left+center+right, then up+mid+down), the same edge-replicate border, the
same clamp/update rules.  The wrapper pads to TPU tile alignment and the
kernel re-replicates the edge rows/columns into the padding every iteration,
so the padded stencil sees exactly the edge-replicate neighborhood of the
unpadded one.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Live VMEM at peak is ~8 f32 planes (x, known, cur, w, shifted temporaries).
# Keep the padded plane under ~1.5 MB so the working set stays well inside
# the ~16 MB/core budget.
_MAX_PADDED_ELEMS = 400_000


def _kernel(iters, H, W, x_ref, k_ref, out_ref):
    x = x_ref[:]
    kf = k_ref[:]                       # known mask as f32 0/1
    Hp, Wp = x.shape

    sub = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (Hp, Wp), 1)

    def fix_pad(a):
        """Replicate the true edge row/column into the alignment padding so
        the rolled neighborhoods reproduce jnp.pad(mode='edge')."""
        if W < Wp:
            a = jnp.where(lane >= W, a[:, W - 1:W], a)
        if H < Hp:
            a = jnp.where(sub >= H, a[H - 1:H, :], a)
        return a

    def avg3(a):
        # horizontal: left + center + right with edge replicate
        # pltpu.roll requires non-negative shifts: -1 == size-1
        left = jnp.where(lane == 0, a, pltpu.roll(a, 1, 1))
        right = jnp.where(lane == Wp - 1, a, pltpu.roll(a, Wp - 1, 1))
        rows = left + a + right
        up = jnp.where(sub == 0, rows, pltpu.roll(rows, 1, 0))
        down = jnp.where(sub == Hp - 1, rows, pltpu.roll(rows, Hp - 1, 0))
        return up + rows + down

    # the init mean is over the TRUE region only (the XLA path's jnp.sum on
    # the unpadded array), not the replicated padding
    in_img = (sub < H) & (lane < W)
    x = fix_pad(x)
    kf = fix_pad(kf)
    known = kf > 0.5

    n = jnp.sum(jnp.where(known & in_img, 1.0, 0.0))
    mean0 = jnp.sum(jnp.where(known & in_img, x, 0.0)) / jnp.maximum(n, 1.0)
    cur0 = jnp.where(known, x, mean0)

    def body(_, state):
        cur, w = state
        num = avg3(cur * w)
        den = avg3(w)
        upd = num / jnp.maximum(den, 1e-6)
        new_w = jnp.minimum(w + jnp.where(den > 1e-6, 1.0, 0.0), 1.0)
        cur = jnp.where(known, x, jnp.where(den > 1e-6, upd, cur))
        # keep the padding in sync with the (possibly updated) edge pixels
        return fix_pad(cur), fix_pad(new_w)

    cur, _ = jax.lax.fori_loop(0, iters, body, (cur0, kf))
    out_ref[:] = cur


from vistaf_tpu.pallas.common import pad_up as _pad_up  # noqa: E402
from vistaf_tpu.pallas.common import padded_elems as _padded_elems  # noqa: E402


def fits_vmem(shape) -> bool:
    return _padded_elems(shape) <= _MAX_PADDED_ELEMS


@functools.partial(jax.jit, static_argnames=("iters", "interpret"))
def inpaint_diffusion_pallas(img: jnp.ndarray, fill_mask: jnp.ndarray,
                             iters: int = 96,
                             interpret: bool = False) -> jnp.ndarray:
    """VMEM-fused equivalent of ``ops.inpaint.inpaint_diffusion`` for 2-D
    arrays that fit the VMEM working-set budget (``fits_vmem``)."""
    H, W = img.shape
    Hp, Wp = _pad_up(H, 8), _pad_up(W, 128)
    x = img.astype(jnp.float32)
    kf = (~fill_mask).astype(jnp.float32)
    x = jnp.pad(x, ((0, Hp - H), (0, Wp - W)))
    kf = jnp.pad(kf, ((0, Hp - H), (0, Wp - W)))

    out = pl.pallas_call(
        functools.partial(_kernel, iters, H, W),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, kf)
    return out[:H, :W]

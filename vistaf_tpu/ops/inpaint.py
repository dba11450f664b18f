"""Mask-constrained inpainting via normalized-convolution diffusion.

Replaces cv2.inpaint(INPAINT_TELEA): Telea is a serial fast-marching method;
diffusion inpainting converges to the same smooth Laplace interpolant for the
small glare/hole regions this pipeline repairs (``shape_ftp.py:652-666``,
``shape_ftp.py:1178-1203``, ``temperature_sensor.py:546-577``), and is a pure
fixed-iteration stencil — ideal for the VPU.

Unknown pixels are initialized to the mean of the known ones, so large
holes start from a sensible baseline and the fixed iteration budget only
has to resolve the local boundary profile, not propagate values across
the hole from scratch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

def _avg3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 box sum via shift-adds (VPU) with edge-replicate border."""
    xp = jnp.pad(x, 1, mode="edge")
    h, w = x.shape
    rows = xp[:, 0:w] + xp[:, 1:w + 1] + xp[:, 2:w + 2]
    return rows[0:h, :] + rows[1:h + 1, :] + rows[2:h + 2, :]


@functools.partial(jax.jit, static_argnames=("iters",))
def inpaint_diffusion(img: jnp.ndarray, fill_mask: jnp.ndarray,
                      iters: int = 96) -> jnp.ndarray:
    """Fill ``fill_mask`` pixels by diffusing from the rest of the image.

    Known pixels are hard-clamped every iteration; unknown pixels relax to
    the masked neighborhood average.

    On TPU, crops that fit the VMEM working-set budget take the fused
    Pallas kernel (identical stencil/ordering — one launch instead of
    ``iters`` launch-bound relaxation rounds); larger arrays and other
    backends run the XLA loop below.
    """
    if img.ndim == 2 and jax.default_backend() == "tpu":
        from vistaf_tpu.pallas.inpaint_kernel import (fits_vmem,
                                                      inpaint_diffusion_pallas)
        if fits_vmem(img.shape):
            return inpaint_diffusion_pallas(img, fill_mask, iters=iters)
    return inpaint_diffusion_xla(img, fill_mask, iters=iters)


@functools.partial(jax.jit, static_argnames=("iters",))
def inpaint_diffusion_xla(img: jnp.ndarray, fill_mask: jnp.ndarray,
                          iters: int = 96) -> jnp.ndarray:
    """The plain XLA relaxation loop (any backend, any size)."""
    x = img.astype(jnp.float32)
    known = ~fill_mask
    kf = known.astype(jnp.float32)
    # initialize unknowns with the global mean of known pixels
    mean0 = jnp.sum(jnp.where(known, x, 0.0)) / jnp.maximum(jnp.sum(kf), 1.0)
    cur = jnp.where(known, x, mean0)
    w = kf

    def body(_, state):
        cur, w = state
        num = _avg3(cur * w)
        den = _avg3(w)
        upd = num / jnp.maximum(den, 1e-6)
        new_w = jnp.minimum(w + jnp.where(den > 1e-6, 1.0, 0.0), 1.0)
        cur = jnp.where(known, x, jnp.where(den > 1e-6, upd, cur))
        return cur, new_w

    cur, _ = jax.lax.fori_loop(0, iters, body, (cur, w))
    return cur


def inpaint_float32(img: jnp.ndarray, bad_mask: jnp.ndarray,
                    iters: int = 64) -> jnp.ndarray:
    """Reference ``inpaint_float32`` semantics (``shape_ftp.py:652-666``):
    non-finite values are replaced by the median of finite values first, then
    ``bad_mask`` pixels are filled."""
    from vistaf_tpu.ops.percentile import masked_median

    x = img.astype(jnp.float32)
    finite = jnp.isfinite(x)
    med = masked_median(x, finite)
    x = jnp.where(finite, x, med)
    return inpaint_diffusion(x, bad_mask, iters=iters)


@functools.partial(jax.jit, static_argnames=("iters", "quantize_u8"))
def inpaint_within_roi(z: jnp.ndarray, roi: jnp.ndarray, fill_mask: jnp.ndarray,
                       iters: int = 96, quantize_u8: bool = False) -> jnp.ndarray:
    """Inpaint only inside ``roi``; outside becomes NaN.

    With ``quantize_u8`` the map is scaled to [0, 255], rounded, filled and
    unscaled — matching the reference temperature inpainting which routes the
    float map through a uint8 image (``temperature_sensor.py:546-577``).
    """
    from vistaf_tpu.ops.percentile import masked_max, masked_min

    z = z.astype(jnp.float32)
    known = roi & jnp.isfinite(z) & ~fill_mask
    missing = roi & fill_mask

    vmin = masked_min(z, known)
    vmax = masked_max(z, known)
    span = vmax - vmin

    if quantize_u8:
        scaled = jnp.where(known, jnp.clip((z - vmin) / jnp.maximum(span, 1e-6) * 255.0, 0, 255), 0.0)
        scaled = jnp.round(scaled)
        filled = inpaint_diffusion(jnp.where(known, scaled, 0.0), ~known, iters=iters)
        filled = jnp.round(jnp.clip(filled, 0, 255))
        restored = filled / 255.0 * span + vmin
    else:
        restored = inpaint_diffusion(jnp.where(known, z, 0.0), ~known, iters=iters)

    out = jnp.where(known, z, jnp.where(missing, restored, jnp.nan))
    out = jnp.where(roi, out, jnp.nan)
    # degenerate span: constant fill (temperature_sensor.py:563-566)
    out = jnp.where(missing & (span < 1e-6), vmin, out)
    return out

"""Shared Mosaic kernel helpers (used by the ECC / inpaint / unwrap
megakernels so border-handling fixes land in one place)."""
from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


def pad_up(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return -(-n // m) * m


def padded_elems(shape) -> int:
    """Element count of a 2-D f32 plane after padding to the (8, 128)
    VMEM tile.  Every kernel's ``fits_vmem`` budget check counts these
    padded elements (its budget constant = planes resident x elems)."""
    return pad_up(shape[0], 8) * pad_up(shape[1], 128)


def pad_to_tile(a: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad a 2-D array up to the (8, 128) VMEM tile grid."""
    h, w = a.shape
    return jnp.pad(a, ((0, pad_up(h, 8) - h), (0, pad_up(w, 128) - w)))


def shift_const0(a: jnp.ndarray, k: int, axis: int,
                 idx: jnp.ndarray) -> jnp.ndarray:
    """a[v + k] along ``axis`` with constant0 border (no wrap-around).

    ``idx`` is a broadcasted iota over ``axis`` (Mosaic needs 2-D iotas,
    so the caller builds it once and reuses it across shifts).
    """
    n = a.shape[axis]
    if k == 0:
        return a
    rolled = pltpu.roll(a, (-k) % n, axis)
    if k > 0:
        return jnp.where(idx >= n - k, 0.0, rolled)
    return jnp.where(idx < -k, 0.0, rolled)

"""Shared Mosaic kernel helpers (used by the ECC / inpaint / unwrap
megakernels so border-handling fixes land in one place)."""
from __future__ import annotations

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu


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

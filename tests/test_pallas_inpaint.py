"""Fused Pallas diffusion-inpaint kernel vs the XLA relaxation loop.

Numerics run here in interpret mode on CPU and must be bit-identical: the
kernel replays the exact shift-add ordering and edge-replicate border of
``inpaint_diffusion_xla`` (measured on the real chip: bit-equal at 236x236
and 100x150, 64 iters).  The real-chip existence proof is
``test_real_tpu_smoke`` (VISTAF_RUN_TPU=1).
"""
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from vistaf_tpu.ops.inpaint import inpaint_diffusion_xla
from vistaf_tpu.pallas.inpaint_kernel import fits_vmem, inpaint_diffusion_pallas


@pytest.mark.parametrize("shape", [(100, 150), (37, 41), (64, 128)])
def test_interpret_bit_identical(shape):
    rng = np.random.default_rng(7)
    img = (rng.random(shape) * 255).astype(np.float32)
    mask = rng.random(shape) < 0.08
    gold = np.asarray(inpaint_diffusion_xla(jnp.asarray(img), jnp.asarray(mask),
                                            iters=24))
    ours = np.asarray(inpaint_diffusion_pallas(jnp.asarray(img),
                                               jnp.asarray(mask), iters=24,
                                               interpret=True))
    np.testing.assert_array_equal(ours, gold)


def test_clamps_known_pixels():
    rng = np.random.default_rng(8)
    img = (rng.random((48, 130)) * 10).astype(np.float32)
    mask = np.zeros((48, 130), bool)
    mask[20:25, 40:60] = True
    out = np.asarray(inpaint_diffusion_pallas(jnp.asarray(img),
                                              jnp.asarray(mask), iters=32,
                                              interpret=True))
    np.testing.assert_array_equal(out[~mask], img[~mask])
    # filled region relaxes toward the neighborhood, not the init mean
    assert np.all(np.isfinite(out[mask]))
    assert np.ptp(out[mask]) < np.ptp(img[~mask])


def test_vmem_budget_gate():
    assert fits_vmem((236, 236))
    assert fits_vmem((480, 640))
    assert not fits_vmem((1400, 1400))   # native-4K crop scale -> XLA path


_TPU_SMOKE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()[0].platform
from vistaf_tpu.ops.inpaint import inpaint_diffusion_xla
from vistaf_tpu.pallas.inpaint_kernel import inpaint_diffusion_pallas
rng = np.random.default_rng(0)
img = jnp.asarray((rng.random((236, 236)) * 255).astype(np.float32))
mask = jnp.asarray(rng.random((236, 236)) < 0.08)
a = np.asarray(inpaint_diffusion_xla(img, mask, iters=64))
b = np.asarray(inpaint_diffusion_pallas(img, mask, iters=64))
assert np.array_equal(a, b), float(np.abs(a - b).max())
print("TPU_INPAINT_OK")
"""


@pytest.mark.skipif(os.environ.get("VISTAF_RUN_TPU") != "1",
                    reason="real-TPU smoke (set VISTAF_RUN_TPU=1)")
def test_real_tpu_smoke():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-c", _TPU_SMOKE],
                         env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TPU_INPAINT_OK" in out.stdout

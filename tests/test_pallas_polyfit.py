"""Fused IRLS polyfit megakernel vs the XLA implementation.

Interpret mode on CPU; real-chip smoke gated on VISTAF_RUN_TPU=1.  The
robust scale uses the bisection bracket (tighter than the hist ladder's)
so coefficients agree to the reweighting sensitivity, not bitwise.
"""
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from vistaf_tpu.ops.polyfit import eval_poly2d, robust_polyfit2d
from vistaf_tpu.pallas.polyfit_kernel import fits_vmem, robust_polyfit2d_pallas


def _scene(rng, h=150, w=210, outlier_frac=0.1):
    import cv2
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    xn = (xx - (w - 1) / 2) / ((w - 1) / 2)
    yn = (yy - (h - 1) / 2) / ((h - 1) / 2)
    truth = 0.8 * xn - 0.5 * yn + 0.2 + 0.6 * xn * xn - 0.3 * xn * yn + 0.1 * yn * yn
    z = truth + 0.02 * rng.standard_normal((h, w)).astype(np.float32)
    out = rng.random((h, w)) < outlier_frac
    z = np.where(out, z + 3.0 * rng.standard_normal((h, w)), z).astype(np.float32)
    mask = np.zeros((h, w), bool)
    cv2.circle(mask.view(np.uint8).reshape(h, w), (w // 2, h // 2),
               min(h, w) // 2 - 6, 1, -1)
    return jnp.asarray(z), jnp.asarray(mask), truth


@pytest.mark.parametrize("order", [1, 2])
def test_matches_xla(rng, order):
    z, mask, truth = _scene(rng)
    cg, fitg = robust_polyfit2d(z, mask, order=order, iters=6,
                                percentile_method="hist", resigma_iters=6)
    ck, fitk = robust_polyfit2d_pallas(z, mask, order=order, iters=6,
                                       resigma_iters=6, interpret=True)
    m = np.asarray(mask)
    # same fit up to the robust-scale bracket difference
    np.testing.assert_allclose(np.asarray(ck), np.asarray(cg),
                               rtol=5e-3, atol=5e-3)
    diff = np.abs(np.asarray(fitk) - np.asarray(fitg))[m]
    assert diff.max() < 2e-2
    if order == 2:
        # and it actually rejects the outliers (close to the ground truth)
        err = np.abs(np.asarray(fitk) - truth)[m]
        assert np.median(err) < 1.5e-2


def test_sigma_freeze_and_degenerate(rng):
    z, mask, _ = _scene(rng)
    c1, _ = robust_polyfit2d_pallas(z, mask, order=2, iters=4,
                                    resigma_iters=2, interpret=True)
    g1, _ = robust_polyfit2d(z, mask, order=2, iters=4,
                             percentile_method="hist", resigma_iters=2)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(g1),
                               rtol=5e-3, atol=5e-3)
    # degenerate mask (<200 px) -> zeros, like the reference
    tiny = jnp.zeros_like(mask).at[10:20, 10:19].set(True)
    c0, fit0 = robust_polyfit2d_pallas(z, tiny, order=2, interpret=True)
    assert float(jnp.abs(c0).max()) == 0.0


def test_vmem_gate():
    assert fits_vmem((236, 236))
    assert not fits_vmem((1747, 1747))


_TPU_SMOKE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()[0].platform
import cv2
from vistaf_tpu.ops.polyfit import robust_polyfit2d
rng = np.random.default_rng(0)
h, w = 236, 236
yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
xn = (xx-(w-1)/2)/((w-1)/2); yn = (yy-(h-1)/2)/((h-1)/2)
z = (0.8*xn - 0.5*yn + 0.2 + 0.6*xn*xn + 0.05*rng.standard_normal((h,w))).astype(np.float32)
mask = np.zeros((h,w), np.uint8); cv2.circle(mask, (118,118), 110, 1, -1)
mb = jnp.asarray(mask.astype(bool))
cg, _ = robust_polyfit2d(jnp.asarray(z), mb, order=2, percentile_method="hist_pallas")
ck, _ = robust_polyfit2d(jnp.asarray(z), mb, order=2, fused=True)
np.testing.assert_allclose(np.asarray(ck), np.asarray(cg), rtol=5e-3, atol=5e-3)
print("TPU_POLYFIT_OK")
"""


@pytest.mark.skipif(os.environ.get("VISTAF_RUN_TPU") != "1",
                    reason="real-TPU smoke gated on VISTAF_RUN_TPU=1")
def test_real_tpu_smoke():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    r = subprocess.run([sys.executable, "-c", _TPU_SMOKE], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TPU_POLYFIT_OK" in r.stdout

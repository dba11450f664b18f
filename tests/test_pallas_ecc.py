"""Fused ECC GN-moment kernel vs the XLA shear-warp + matmul formulation.

Numerics run in interpret mode on CPU; agreement is f32 accumulation-order
level (the kernel sums planes on the VPU, the XLA path uses a HIGHEST-
precision matmul).  The real-chip existence proof is ``test_real_tpu_smoke``
(VISTAF_RUN_TPU=1).  Reference semantics: ``ops.registration.ecc_align``
(cv2 findTransformECC, shape_ftp.py:549-578) with the deploy shear sampler.
"""
import os
import subprocess
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vistaf_tpu.ops.warp import shear_warp_stack
from vistaf_tpu.pallas.ecc_kernel import fits_vmem, gn_moments_euclidean


def _xla_moments(S_cf, T, smask, p, K):
    c, s = jnp.cos(p[0]), jnp.sin(p[0])
    Mw = jnp.array([[c, -s, p[1]], [s, c, p[2]]], jnp.float32)
    samp = shear_warp_stack(S_cf, Mw, K=K)
    mf = (samp[3] > 0.95).astype(jnp.float32) * smask
    gxm = samp[1] * mf
    gym = samp[2] * mf
    h, w = T.shape
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    G0 = gxm * (-s * uu - c * vv) + gym * (c * uu - s * vv)
    A = jnp.stack([mf.ravel(), (T * mf).ravel(), (samp[0] * mf).ravel(),
                   G0.ravel(), gxm.ravel(), gym.ravel()], 0)
    return np.asarray(jax.lax.dot_general(
        A, A, (((1,), (1,)), ((), ())), precision=jax.lax.Precision.HIGHEST))


def _coeffs(p):
    c, s = jnp.cos(p[0]), jnp.sin(p[0])
    a00, a01, a02 = c, -s, p[1]
    a10, a11, a12 = s, c, p[2]
    r = a10 / a00
    return jnp.stack([r, a11 - r * a01 - 1.0, a12 - r * a02,
                      a00 - 1.0, a01, a02, c, s])


@pytest.mark.parametrize("stride", [1, 2])
def test_interpret_matches_xla(stride):
    rng = np.random.default_rng(11)
    h, w = 100, 150
    I = rng.random((h, w)).astype(np.float32)
    gx = np.zeros_like(I); gx[:, 1:-1] = 0.5 * (I[:, 2:] - I[:, :-2])
    gy = np.zeros_like(I); gy[1:-1, :] = 0.5 * (I[2:, :] - I[:-2, :])
    M01 = (rng.random((h, w)) > 0.2).astype(np.float32)
    T = (rng.random((h, w)) - 0.5).astype(np.float32)
    S_cf = jnp.stack([jnp.asarray(I), jnp.asarray(gx), jnp.asarray(gy),
                      jnp.asarray(M01)], 0)
    smask = np.zeros((h, w), np.float32)
    smask[::stride, ::stride] = 1.0
    p = jnp.asarray([0.003, 0.4, -0.7], jnp.float32)

    gold = _xla_moments(S_cf, jnp.asarray(T), jnp.asarray(smask), p, K=4)
    ours = np.asarray(gn_moments_euclidean(S_cf, jnp.asarray(T),
                                           jnp.asarray(smask), _coeffs(p),
                                           K=4, interpret=True))
    rel = np.abs(ours - gold) / np.maximum(np.abs(gold), 1e-3)
    assert rel.max() < 1e-4, rel.max()


def test_vmem_budget_gate():
    assert fits_vmem((236, 236))
    assert not fits_vmem((1747, 1747))   # native-4K crop -> XLA body


def test_loop_kernel_vmem_budget_is_tighter():
    """The whole-solver kernel keeps ~40 f32 planes on the scoped-VMEM
    stack vs the per-iteration kernel's ~16, so it must gate on its own
    budget: at the ecc_downsample=4 4K ROI size (296x384) the loop form
    measured an 18.16 MB stack against the 16 MiB limit (hard compile
    error), while the per-iteration kernel still fits — ecc_align must
    fall back rather than crash."""
    from vistaf_tpu.pallas.ecc_loop_kernel import fits_vmem_loop
    assert fits_vmem_loop((236, 236))    # 640x480-scale ROI: loop form OK
    assert not fits_vmem_loop((296, 384))
    assert fits_vmem((296, 384))         # ...but the per-iteration form does


def test_vmap_batches(rng=None):
    """The 4-stream batched pipeline vmaps ecc_align over streams, which
    vmaps this pallas_call — every operand must live in a batchable memory
    space (SMEM operands break; regression for the streams-bench failure)."""
    rng = np.random.default_rng(5)
    h, w = 48, 130
    S = jnp.asarray(rng.random((3, 4, h, w)).astype(np.float32))
    T = jnp.asarray(rng.random((3, h, w)).astype(np.float32))
    sm = jnp.ones((3, h, w), jnp.float32)
    p = jnp.asarray([0.002, 0.3, -0.2], jnp.float32)
    co = jnp.broadcast_to(_coeffs(p), (3, 8))
    f = jax.vmap(lambda s, t, m, c: gn_moments_euclidean(
        s, t, m, c, K=4, interpret=True))
    out = np.asarray(f(S, T, sm, co))
    assert out.shape == (3, 6, 6)
    gold = np.asarray(gn_moments_euclidean(S[1], T[1], sm[1], co[1], K=4,
                                           interpret=True))
    np.testing.assert_allclose(out[1], gold, rtol=1e-5, atol=1e-3)


_TPU_SMOKE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()[0].platform
from vistaf_tpu.ops.registration import ecc_align
rng = np.random.default_rng(3)
base = rng.random((200, 260)).astype(np.float32)
from vistaf_tpu.ops.filters import gaussian_blur
t = np.asarray(gaussian_blur(jnp.asarray(base), 3.0))
# shift the image by ~1px so ECC has something to find
img = np.roll(t, 1, axis=1)
mask = np.ones((200, 260), bool)
warp, rho, it = ecc_align(jnp.asarray(t), jnp.asarray(img), jnp.asarray(mask),
                          mode="euclidean", max_iters=60, sampler="shear",
                          shear_k=4)
warp = np.asarray(warp); rho_f = float(rho)
assert rho_f > 0.95, rho_f
assert abs(abs(warp[0, 2]) - 1.0) < 0.35, warp
print("TPU_ECC_OK", rho_f)
"""


@pytest.mark.skipif(os.environ.get("VISTAF_RUN_TPU") != "1",
                    reason="real-TPU smoke (set VISTAF_RUN_TPU=1)")
def test_real_tpu_smoke():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-c", _TPU_SMOKE],
                         env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TPU_ECC_OK" in out.stdout


def _ecc_inputs(rng, th=0.004, tx=0.9, ty=-0.6, h=96, w=130):
    """Mean-centered template/stack exactly as ecc_align prepares them."""
    import cv2
    base = cv2.GaussianBlur(rng.random((h + 20, w + 20)).astype(np.float32),
                            (0, 0), 3)
    c, s = np.cos(th), np.sin(th)
    M = np.array([[c, -s, tx], [s, c, ty]], np.float32)
    img = cv2.warpAffine(base, M, (w + 20, h + 20),
                         flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
    T = base[10:-10, 10:-10].copy()
    I = img[10:-10, 10:-10].copy()
    mask = np.zeros((h, w), np.float32)
    cv2.circle(mask, (w // 2, h // 2), min(h, w) // 2 - 6, 1.0, -1)

    c0 = float((T * mask).sum() / max(mask.sum(), 1.0))
    Tc = (T - c0).astype(np.float32)
    Ic = (I - c0).astype(np.float32)
    gx = np.zeros_like(Ic); gx[:, 1:-1] = 0.5 * (Ic[:, 2:] - Ic[:, :-2])
    gy = np.zeros_like(Ic); gy[1:-1, :] = 0.5 * (Ic[2:, :] - Ic[:-2, :])
    S_cf = jnp.asarray(np.stack([Ic, gx, gy, mask], axis=0))
    return jnp.asarray(T), jnp.asarray(I), jnp.asarray(mask > 0), \
        S_cf, jnp.asarray(Tc), (th, tx, ty)


def test_loop_kernel_matches_xla_solver(rng):
    """The whole-loop fused solver must land on the same warp as the XLA
    while_loop (shear sampler) — same moments, adjugate vs LU solve."""
    from vistaf_tpu.ops.registration import ecc_align
    from vistaf_tpu.pallas.ecc_loop_kernel import ecc_loop_euclidean

    T, I, maskb, S_cf, Tc, true_p = _ecc_inputs(rng)
    sm = jnp.ones_like(Tc)

    warp_x, rho_x, it_x = ecc_align(T, I, maskb, mode="euclidean",
                                    max_iters=60, eps=1e-7, sampler="shear",
                                    shear_k=4)
    p, rho, it, failed = ecc_loop_euclidean(S_cf, Tc, sm, K=4, max_iters=60,
                                            eps=1e-7, interpret=True)
    assert not bool(failed)
    # both solvers must land on the same warp (the found warp is M^-1 of
    # the generating warp — inverse-map convention — so compare to XLA)
    assert abs(float(rho) - float(rho_x)) < 1e-4
    wx = np.asarray(warp_x)
    th_x = float(np.arctan2(wx[1, 0], wx[0, 0]))
    assert abs(float(p[0]) - th_x) < 5e-5
    assert abs(float(p[1]) - wx[0, 2]) < 5e-3
    assert abs(float(p[2]) - wx[1, 2]) < 5e-3
    # and recover the generating warp's magnitude
    assert abs(abs(float(p[0])) - abs(true_p[0])) < 5e-4


def test_loop_kernel_stall_patience(rng):
    """stall_patience must stop early and return the best-rho iterate."""
    from vistaf_tpu.pallas.ecc_loop_kernel import ecc_loop_euclidean

    T, I, maskb, S_cf, Tc, _ = _ecc_inputs(rng, th=0.002, tx=0.4, ty=0.3)
    sm = jnp.ones_like(Tc)
    p, rho, it, failed = ecc_loop_euclidean(S_cf, Tc, sm, K=4, max_iters=200,
                                            eps=0.0,  # never eps-converge
                                            stall_patience=6, interpret=True)
    assert int(it) < 200
    assert np.isfinite(float(rho))


_TPU_LOOP_SMOKE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()[0].platform
import cv2
from vistaf_tpu.ops.registration import ecc_align
rng = np.random.default_rng(0)
h, w = 96, 130
base = cv2.GaussianBlur(rng.random((h+20, w+20)).astype(np.float32), (0,0), 3)
th, tx, ty = 0.004, 0.9, -0.6
c, s = np.cos(th), np.sin(th)
M = np.array([[c, -s, tx], [s, c, ty]], np.float32)
img = cv2.warpAffine(base, M, (w+20, h+20), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
T = jnp.asarray(base[10:-10, 10:-10]); I = jnp.asarray(img[10:-10, 10:-10])
mask = np.zeros((h, w), np.uint8); cv2.circle(mask, (w//2, h//2), min(h,w)//2-6, 1, -1)
mb = jnp.asarray(mask.astype(bool))
wx, rx, ix = ecc_align(T, I, mb, mode="euclidean", max_iters=60, eps=1e-7, sampler="shear", shear_k=4)
wk, rk, ik = ecc_align(T, I, mb, mode="euclidean", max_iters=60, eps=1e-7, sampler="shear", shear_k=4, loop_kernel=True)
assert abs(float(rk) - float(rx)) < 1e-4, (float(rk), float(rx))
np.testing.assert_allclose(np.asarray(wk), np.asarray(wx), atol=5e-3)
print("TPU_ECC_LOOP_OK")
"""


@pytest.mark.skipif(os.environ.get("VISTAF_RUN_TPU") != "1",
                    reason="real-TPU smoke gated on VISTAF_RUN_TPU=1")
def test_loop_kernel_real_tpu_smoke():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    r = subprocess.run([sys.executable, "-c", _TPU_LOOP_SMOKE], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "TPU_ECC_LOOP_OK" in r.stdout

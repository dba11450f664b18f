"""Image registration: windowed phase correlation and ECC photometric
alignment, both as fixed-shape jitted graphs.

Phase correlation reproduces cv2.phaseCorrelate (Hann window, cross-power
spectrum, 5x5 weighted-centroid subpixel peak) — ``shape_ftp.py:529-535``.

ECC reproduces cv2.findTransformECC's enhanced-correlation-coefficient
Gauss–Newton iteration (Evangelidis & Psarakis) for translation / euclidean /
affine warps with an input mask — ``shape_ftp.py:549-578``.  The serial
"iterate until eps" loop becomes a ``lax.while_loop`` with the same
termination rule (|rho - last_rho| < eps or max iters).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp



# ---------------------------------------------------------------------------
# Phase correlation
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("norm_eps",))
def phase_correlate(src1: jnp.ndarray, src2: jnp.ndarray,
                    window: jnp.ndarray, norm_eps: float = 0.0
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """cv2.phaseCorrelate equivalent.

    Returns (dx, dy, response): the translation of ``src1`` relative to
    ``src2`` (so translating src2 by (+dx, +dy) aligns it with src1).

    ``norm_eps`` > 0 regularizes the cross-power normalization to
    P / (|P| + norm_eps * max|P|): the pure P/|P| whitening amplifies the
    noise-dominated bins a pre-blur has driven to ~0 to unit magnitude
    (the round-3 pooled-global-shift incident, docs/PERF.md) — the
    regularized form keeps the strong-signal bins' unit phase weight but
    damps bins with no coherent signal.  0.0 = cv2-faithful whitening.
    """
    h, w = src1.shape
    a = src1.astype(jnp.float32) * window
    b = src2.astype(jnp.float32) * window

    # real-input transforms: the cross-power spectrum of two real images is
    # Hermitian, and |P| is symmetric, so the normalized spectrum stays
    # Hermitian and irfft2 reconstructs exactly real(ifft2(P_full)) at half
    # the FFT work (cv2.phaseCorrelate also runs real DFTs).  Both forward
    # transforms run as ONE batched rfft2 (the graph is launch-bound).
    F = jnp.fft.rfft2(jnp.stack([a, b]), axes=(-2, -1))
    P = F[0] * jnp.conj(F[1])
    mag = jnp.abs(P)
    if norm_eps and norm_eps > 0.0:
        P = P / (mag + jnp.float32(norm_eps) * jnp.max(mag) + 1e-30)
    else:
        P = P / jnp.maximum(mag, 1e-20)
    C = jnp.fft.irfft2(P, s=(h, w))
    C = jnp.fft.fftshift(C)

    peak = jnp.argmax(C)
    py = (peak // w).astype(jnp.int32)
    px = (peak % w).astype(jnp.int32)

    # 5x5 weighted centroid around the peak (cv2 weightedCentroid), gather-
    # free: TPU pays per gathered index, so sum over an iota-masked window
    # instead.  Identical to the clipped-index gather except when the peak
    # sits within 2 px of the border (there cv2's clipping double-counts
    # edge pixels; the window truncation here is the saner estimate, and the
    # windowed correlation surface never peaks at the border).
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inwin = ((jnp.abs(yy - py) <= 2) & (jnp.abs(xx - px) <= 2)).astype(jnp.float32)
    vals = C * inwin
    s = jnp.sum(vals)
    den = jnp.where(jnp.abs(s) < 1e-20, 1.0, s)
    cy = jnp.sum(yy.astype(jnp.float32) * vals) / den
    cx = jnp.sum(xx.astype(jnp.float32) * vals) / den

    center_x = w / 2.0
    center_y = h / 2.0
    dx = center_x - cx
    dy = center_y - cy
    response = s / (h * w)
    return dx, dy, response



# ---------------------------------------------------------------------------
# ECC alignment
# ---------------------------------------------------------------------------

_MODES = {"translation": 2, "euclidean": 3, "affine": 6}


def _warp_coords(mode: str, p: jnp.ndarray, xx: jnp.ndarray, yy: jnp.ndarray):
    if mode == "translation":
        return xx + p[0], yy + p[1]
    if mode == "euclidean":
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        return c * xx - s * yy + p[1], s * xx + c * yy + p[2]
    # affine: p = [a00-1? ...] use direct entries: sx = (1+p0)x + p2 y + p4 ...
    sx = (1.0 + p[0]) * xx + p[2] * yy + p[4]
    sy = p[1] * xx + (1.0 + p[3]) * yy + p[5]
    return sx, sy


def _warp_matrix(mode: str, p: jnp.ndarray) -> jnp.ndarray:
    if mode == "translation":
        return jnp.array([[1.0, 0.0, p[0]], [0.0, 1.0, p[1]]], jnp.float32)
    if mode == "euclidean":
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        return jnp.array([[c, -s, p[1]], [s, c, p[2]]], jnp.float32)
    return jnp.array([[1.0 + p[0], p[2], p[4]], [p[1], 1.0 + p[3], p[5]]], jnp.float32)


def _steepest_descent(mode: str, p: jnp.ndarray, xx, yy, gxw, gyw):
    """Steepest-descent images G_k = gx * dWx/dp_k + gy * dWy/dp_k."""
    if mode == "translation":
        return [gxw, gyw]
    if mode == "euclidean":
        c, s = jnp.cos(p[0]), jnp.sin(p[0])
        dwx_dth = -s * xx - c * yy
        dwy_dth = c * xx - s * yy
        return [gxw * dwx_dth + gyw * dwy_dth, gxw, gyw]
    return [gxw * xx, gyw * xx, gxw * yy, gyw * yy, gxw, gyw]


@functools.partial(jax.jit, static_argnames=("mode", "max_iters", "eps",
                                             "stride", "sampler", "shear_k",
                                             "stall_patience", "loop_kernel"))
def ecc_align(template: jnp.ndarray, image: jnp.ndarray,
              mask: jnp.ndarray, mode: str = "euclidean",
              max_iters: int = 300, eps: float = 1e-7, stride: int = 1,
              sampler: str = "gather", shear_k: int = 4,
              stall_patience: int = 0, loop_kernel: bool = False,
              p_init: Optional[jnp.ndarray] = None):
    """Find warp p maximizing the enhanced correlation coefficient between
    ``template`` and ``image`` sampled at W(x; p).

    Inputs are float images (already normalized/blurred by the caller, as the
    reference does at ``shape_ftp.py:553-558``).  ``mask`` bounds the valid
    template region; it is warped alongside the image every iteration (cv2
    semantics).  Returns (warp_2x3, rho, n_iters).

    ``stride`` subsamples the Gauss-Newton statistics grid (TPU gathers pay
    per index; stride 2-3 keeps the estimate while cutting the dominant
    cost 4-9x).  stride=1 is bit-faithful to the reference formulation.

    ``sampler='shear'`` replaces the per-iteration bilinear gather (~200 us
    on TPU) with the gather-free two-pass shear warp (valid for residual
    warps within ±(shear_k-1) px — the post-global-shift regime); 'gather'
    is the reference-faithful default.

    ``p_init`` seeds the Gauss-Newton iteration with a warp-parameter
    vector instead of the identity (the coarse-to-fine polish path: the
    coarse-grid solution, translations rescaled by the caller).  Not
    supported by the whole-solver loop kernel — the caller gets the
    per-iteration/XLA path when a seed is given.

    ``stall_patience`` > 0 adds a divergence early-out: stop once rho has
    not improved on its running best for that many consecutive iterations.
    cv2 has no such rule (it burns the full ``max_iters`` budget in the
    oscillating non-convergent regime — the ROUND_METAL demo scene), so 0
    (disabled) is the reference-faithful default; the deploy preset enables
    it.  On a stall-stop the returned warp is the best-rho iterate, which
    dominates the arbitrary 300th-iterate cv2 would return.
    """
    n_params = _MODES[mode]
    h, w = template.shape
    T = template.astype(jnp.float32)
    I = image.astype(jnp.float32)
    M01 = mask.astype(jnp.float32)

    # Pre-center both images by the template's masked mean: the moment
    # algebra below is exactly invariant to a constant shift, but values
    # near zero keep the f32 variance subtractions well-conditioned.
    c0 = jnp.sum(T * M01) / jnp.maximum(jnp.sum(M01), 1.0)
    T = T - c0
    I = I - c0

    # image gradients (central differences, cv2-style 0.5*(I[x+1]-I[x-1]))
    gx = jnp.zeros_like(I).at[:, 1:-1].set(0.5 * (I[:, 2:] - I[:, :-2]))
    gy = jnp.zeros_like(I).at[1:-1, :].set(0.5 * (I[2:, :] - I[:-2, :]))

    # one stacked plane so each GN iteration does a single 4-channel gather
    # (channel-first for the shear path so tiled minor dims stay spatial)
    from vistaf_tpu.ops.warp import sample_bilinear_stack, shear_warp_stack
    S = jnp.stack([I, gx, gy, M01], axis=-1)
    S_cf = jnp.stack([I, gx, gy, M01], axis=0)

    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # The shear sampler warps the full-res stack (strided slices force a
    # relayout, ~300 us/iter); the stride is instead folded into the mask as
    # a 0/1 grid, which yields numerically identical strided statistics.
    stride_mask = None
    if stride > 1:
        if sampler == "shear":
            sm = jnp.zeros((h, w), jnp.float32).at[::stride, ::stride].set(1.0)
            stride_mask = sm
        else:
            yy = yy[::stride, ::stride]
            xx = xx[::stride, ::stride]
            T = T[::stride, ::stride]
    tcol = T.ravel()

    p0 = (jnp.zeros((n_params,), jnp.float32) if p_init is None
          else p_init.astype(jnp.float32).reshape(n_params))
    eye = 1e-12 * jnp.eye(n_params, dtype=jnp.float32)

    def _sample(p):
        """Returns (iw, gxw, gyw, mf) warped planes on the statistics grid."""
        if sampler == "shear":
            samp = shear_warp_stack(S_cf, _warp_matrix(mode, p), K=shear_k)
            mf = (samp[3] > 0.95).astype(jnp.float32)
            if stride_mask is not None:
                mf = mf * stride_mask
            return samp[0], samp[1], samp[2], mf
        sx, sy = _warp_coords(mode, p, xx, yy)
        samp = sample_bilinear_stack(S, sy, sx)
        return (samp[..., 0], samp[..., 1], samp[..., 2],
                (samp[..., 3] > 0.95).astype(jnp.float32))

    # euclidean/shear iterations fuse the warp + steepest-descent + moment
    # statistics into one Pallas launch (the while_loop is otherwise
    # launch-bound at ~8 kernels/iteration); identical tap weights and
    # moment entries, f32 accumulation either way.
    from vistaf_tpu.pallas.ecc_kernel import fits_vmem, gn_moments_euclidean
    fused = (sampler == "shear" and mode == "euclidean"
             and jax.default_backend() == "tpu" and fits_vmem(template.shape))
    if fused:
        smask = (stride_mask if stride_mask is not None
                 else jnp.ones((h, w), jnp.float32))
        from vistaf_tpu.pallas.ecc_loop_kernel import (ecc_loop_euclidean,
                                                       fits_vmem_loop)
        # The whole-solver form keeps ~40 planes on the scoped-VMEM stack
        # (vs ~16 per-iteration), so it has its own tighter size budget;
        # above it, fall through to the per-iteration fused kernel below
        # (identical moment algebra, just one launch per GN iteration).
        # It always starts from the identity, so a seeded solve also takes
        # the per-iteration path.
        if loop_kernel and p_init is None and fits_vmem_loop(template.shape):
            # whole-solver fusion: the while_loop and its 3x3-solve tail run
            # inside the kernel too (pallas/ecc_loop_kernel.py)
            p, rho, it, failed = ecc_loop_euclidean(
                S_cf, T, smask, K=shear_k, max_iters=max_iters, eps=eps,
                stall_patience=stall_patience)
            identity = _warp_matrix(mode, jnp.zeros_like(p))
            warp = jnp.where(failed, identity, _warp_matrix(mode, p))
            rho = jnp.where(failed, jnp.nan, rho)
            return warp, rho, it

    def _moments(p):
        if fused:
            c, s_ = jnp.cos(p[0]), jnp.sin(p[0])
            # shear decomposition of the euclidean warp matrix
            # [[c, -s, tx], [s, c, ty]] (see ops.warp.shear_warp_stack)
            a00, a01, a02 = c, -s_, p[1]
            a10, a11, a12 = s_, c, p[2]
            r = a10 / a00
            coeffs = jnp.stack([r, a11 - r * a01 - 1.0, a12 - r * a02,
                                a00 - 1.0, a01, a02, c, s_])
            return gn_moments_euclidean(S_cf, T, smask, coeffs, K=shear_k)
        iw, gxw, gyw, mf = _sample(p)
        gxm = gxw * mf
        gym = gyw * mf
        G = _steepest_descent(mode, p, xx, yy, gxm, gym)

        # Every Gauss-Newton statistic is an entry of A A^T for the masked
        # row matrix A = [m; T*m; I*m; G_1..G_P]: one (3+P)x(3+P) MXU
        # matmul replaces the ~15 separate reduction kernels of the naive
        # formulation (each launch costs ~10 us; the loop is launch-bound).
        # Rows-first keeps N in the tiled lane dimension.
        A = jnp.stack([mf.ravel(), tcol * mf.ravel(), (iw * mf).ravel()]
                      + [g.ravel() for g in G], axis=0)  # (3+P, N)
        return jax.lax.dot_general(A, A, (((1,), (1,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)

    def body(state):
        p, last_rho, rho, it, failed, best_rho, best_p, stall = state
        Mom = _moments(p)

        n = jnp.maximum(Mom[0, 0], 1.0)
        st, si = Mom[0, 1], Mom[0, 2]
        sg = Mom[0, 3:]
        corr = Mom[1, 2] - st * si / n
        tnorm2 = Mom[1, 1] - st * st / n
        inorm2 = Mom[2, 2] - si * si / n
        Gt = Mom[1, 3:] - (st / n) * sg
        Gi = Mom[2, 3:] - (si / n) * sg
        H = Mom[3:, 3:]

        # solve H [u, v1] = [Gt, Gi]; then Ge = G^T(lam*tz - iz) = lam*Gt - Gi
        # and dp = H^-1 Ge = lam*u - v1 — no second reduction pass needed.
        UV = jnp.linalg.solve(H + eye, jnp.stack([Gt, Gi], axis=1))
        u, v1 = UV[:, 0], UV[:, 1]
        lam_num = inorm2 - Gi @ v1
        lam_den = corr - Gt @ v1
        lam = lam_num / jnp.where(jnp.abs(lam_den) < 1e-12, 1e-12, lam_den)
        dp = lam * u - v1
        p_new = p + dp

        new_rho = corr / jnp.maximum(
            jnp.sqrt(jnp.maximum(tnorm2, 0.0) * jnp.maximum(inorm2, 0.0)), 1e-12)
        # cv2 findTransformECC raises StsNoConv when the lambda denominator is
        # non-positive or rho goes NaN; the reference catches that and falls
        # back to the unaligned image (shape_ftp.py:576-578).  Mirror it.
        now_failed = (lam_den <= 0.0) | jnp.isnan(new_rho)
        p_new = jnp.where(now_failed, p, p_new)
        # new_rho measures the CURRENT iterate p (the statistics above were
        # sampled at p), so the best-rho iterate to remember is p
        improved = new_rho > best_rho
        best_rho = jnp.where(improved, new_rho, best_rho)
        best_p = jnp.where(improved, p, best_p)
        stall = jnp.where(improved, jnp.int32(0), stall + 1)
        return (p_new, rho, new_rho, it + 1, failed | now_failed,
                best_rho, best_p, stall)

    def cond(state):
        p, last_rho, rho, it, failed, best_rho, best_p, stall = state
        go = (it < max_iters) & (jnp.abs(rho - last_rho) >= eps) & ~failed
        if stall_patience > 0:
            go = go & (stall < stall_patience)
        return go

    state = (p0, jnp.float32(-2.0), jnp.float32(-1.0), jnp.int32(0),
             jnp.bool_(False), jnp.float32(-2.0), p0, jnp.int32(0))
    p, _, rho, it, failed, best_rho, best_p, stall = jax.lax.while_loop(
        cond, body, state)
    if stall_patience > 0:
        stalled = stall >= stall_patience
        p = jnp.where(stalled, best_p, p)
        rho = jnp.where(stalled, best_rho, rho)
    identity = _warp_matrix(mode, jnp.zeros_like(p))
    warp = jnp.where(failed, identity, _warp_matrix(mode, p))
    rho = jnp.where(failed, jnp.nan, rho)
    return warp, rho, it


def ecc_align_and_warp(ref: jnp.ndarray, mov: jnp.ndarray, mask: jnp.ndarray,
                       mode: str = "euclidean", max_iters: int = 300,
                       eps: float = 1e-7, gauss_filt: float = 5.0):
    """Reference ``align_crop_ecc`` (``shape_ftp.py:549-578``): normalize to
    [0,1], optional pre-blur, ECC, then warp the moving image with the inverse
    map and reflect border."""
    from vistaf_tpu.ops.filters import gaussian_blur
    from vistaf_tpu.ops.warp import warp_affine_inverse_map

    r = ref.astype(jnp.float32) / 255.0
    m = mov.astype(jnp.float32) / 255.0
    if gauss_filt and gauss_filt > 0:
        r = gaussian_blur(r, gauss_filt)
        m = gaussian_blur(m, gauss_filt)
    warp, rho, it = ecc_align(r, m, mask, mode=mode, max_iters=max_iters, eps=eps)
    aligned = warp_affine_inverse_map(mov.astype(jnp.float32), warp, border="reflect")
    return aligned, warp, rho

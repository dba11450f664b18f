"""Masked 2-D phase unwrapping as a weighted least-squares solve.

The reference uses a serial quality-guided flood fill over a heapq — a pure
Python O(N log N) loop and the single slowest stage of the whole pipeline
(``shape_ftp.py:1043-1080``, SURVEY.md §3.2 ♨♨).  That algorithm cannot map
to TPU; we substitute the classical weighted least-squares formulation
(Ghiglia & Pritt): find φ minimizing Σ w ( Δφ − W(Δψ) )² over both axes,
solved by preconditioned conjugate gradients with a DCT-based Poisson
preconditioner.  For the smooth phase fields this sensor produces, the two
methods agree up to terms absorbed by the downstream polynomial detrend
(``shape_ftp.py:1708-1751``); see tests/test_unwrap.py.

Fully parallel: each CG iteration is two DCTs + stencils.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def wrap_angle(x: jnp.ndarray) -> jnp.ndarray:
    """Wrap to (-pi, pi]  (equivalent of angle(exp(i x)))."""
    return jnp.angle(jnp.exp(1j * x)).astype(jnp.float32)


@functools.lru_cache(maxsize=16)
def _dct2_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix: (D @ x) = dct(x, type=2, norm='ortho').

    At this pipeline's sizes (~256) the FFT-based DCT lowering costs ~30 us
    per 2-D transform pair while the dense matmul runs on the MXU in single
    microseconds — and it is exact, not an approximation."""
    k = np.arange(n)[:, None].astype(np.float64)
    x = np.arange(n)[None, :].astype(np.float64)
    D = np.cos(np.pi * (2.0 * x + 1.0) * k / (2.0 * n))
    D *= np.sqrt(2.0 / n)
    D[0] *= np.sqrt(0.5)
    return D.astype(np.float32)


# Above this size the FFT-based DCT beats the dense matmul: the matmul
# costs 2*n^2*m FLOPs per axis regardless (at the native-4K crop, ~40
# GFLOP per preconditioner application), the FFT ~5*n*log2(n)*m.  Below
# it the matmul's single MXU pass wins (launch-bound regime; measured
# ~30 us for the FFT lowering vs single-digit us for the matmul at ~256).
_DCT_FFT_MIN_PX = 512


def _poisson_dct_solve(rho: jnp.ndarray) -> jnp.ndarray:
    """Solve the Neumann Poisson equation Laplacian(phi) = rho via DCT-II
    (dense MXU matmuls at crop scale, FFT-based DCT at native-4K scale;
    identical transforms to ~1e-6)."""
    h, w = rho.shape
    use_fft = min(h, w) >= _DCT_FFT_MIN_PX
    if use_fft:
        from jax.scipy import fft as jfft
        r = jfft.dct(jfft.dct(rho, type=2, norm="ortho", axis=0),
                     type=2, norm="ortho", axis=1)
    else:
        Dh = jnp.asarray(_dct2_matrix(h))
        Dw = jnp.asarray(_dct2_matrix(w))
        hp = jax.lax.Precision.HIGHEST
        r = jnp.dot(jnp.dot(Dh, rho, precision=hp), Dw.T, precision=hp)
    ky = jnp.pi * jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) / h
    kx = jnp.pi * jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) / w
    denom = 2.0 * (jnp.cos(ky) - 1.0) + 2.0 * (jnp.cos(kx) - 1.0)
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    out = r / denom
    out = out.at[0, 0].set(0.0)
    if use_fft:
        from jax.scipy import fft as jfft
        return jfft.idct(jfft.idct(out, type=2, norm="ortho", axis=0),
                         type=2, norm="ortho", axis=1)
    return jnp.dot(jnp.dot(Dh.T, out, precision=hp), Dw, precision=hp)


def _div2(fx: jnp.ndarray, fy: jnp.ndarray) -> jnp.ndarray:
    """Divergence of edge fluxes: out[i] = fx[i] - fx[i-1] + fy[i] - fy[i-1]
    with zero flux outside — expressed as padded slices (no scatter-adds,
    which lower poorly on TPU)."""
    fxp = jnp.pad(fx, ((0, 0), (1, 1)))
    fyp = jnp.pad(fy, ((1, 1), (0, 0)))
    return (fxp[:, 1:] - fxp[:, :-1]) + (fyp[1:, :] - fyp[:-1, :])


def _apply_wlap(phi: jnp.ndarray, wx: jnp.ndarray, wy: jnp.ndarray) -> jnp.ndarray:
    """A(phi) = divergence of weighted forward-difference gradients."""
    fx = wx * (phi[:, 1:] - phi[:, :-1])
    fy = wy * (phi[1:, :] - phi[:-1, :])
    return _div2(fx, fy)


def _wls_pcg_solve(psi: jnp.ndarray, m: jnp.ndarray,
                   cg_iters: int, tol: float) -> jnp.ndarray:
    """The PCG core: smooth (non-congruent, un-gauged) WLS solution, defined
    over the WHOLE grid (outside the mask it is the natural smooth
    extension — no NaNs, so callers may resample it)."""
    # per-edge binary weights: both endpoints inside the mask
    wx = m[:, 1:] * m[:, :-1]
    wy = m[1:, :] * m[:-1, :]

    dx = wrap_angle(psi[:, 1:] - psi[:, :-1]) * wx
    dy = wrap_angle(psi[1:, :] - psi[:-1, :]) * wy

    rhs = _div2(dx, dy)

    # PCG with DCT-Poisson preconditioner (Ghiglia & Romero)
    phi0 = jnp.zeros_like(psi)
    r0 = rhs - _apply_wlap(phi0, wx, wy)
    z0 = _poisson_dct_solve(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    r0_norm = jnp.vdot(r0, r0)

    def body(state):
        phi, r, p, rz, it = state
        Ap = _apply_wlap(p, wx, wy)
        pAp = jnp.vdot(p, Ap)
        alpha = rz / jnp.where(jnp.abs(pAp) < 1e-30, 1e-30, pAp)
        phi = phi + alpha * p
        r = r - alpha * Ap
        z = _poisson_dct_solve(r)
        rz_new = jnp.vdot(r, z)
        beta = rz_new / jnp.where(jnp.abs(rz) < 1e-30, 1e-30, rz)
        p = z + beta * p
        return phi, r, p, rz_new, it + 1

    def cond(state):
        phi, r, p, rz, it = state
        return (it < cg_iters) & (jnp.vdot(r, r) > tol * tol * r0_norm)

    phi, r, _, _, _ = jax.lax.while_loop(
        cond, body, (phi0, r0, p0, rz0, jnp.int32(0)))
    return phi


def _gauge_and_project(phi: jnp.ndarray, psi: jnp.ndarray, m: jnp.ndarray,
                       mask: jnp.ndarray, congruent: bool) -> jnp.ndarray:
    """Gauge-anchor ``phi`` to the wrapped input's masked mean, optionally
    congruence-project, NaN outside the mask.

    Gauge: the masked-constant null space of A is invisible to CG, so phi
    can carry an arbitrarily large constant (the preconditioner injects
    some every iteration); a single f32 sum of (psi - phi) then loses
    ~|const|*eps to cancellation (observed ~0.1 rad at |const|~4e4).
    Two-pass mean: the second pass sums small residuals exactly."""
    n = jnp.maximum(jnp.sum(m), 1.0)
    d = psi - phi
    s1 = jnp.sum(d * m) / n
    mean_shift = s1 + jnp.sum((d - s1) * m) / n
    phi = phi + mean_shift

    if congruent:
        two_pi = 2.0 * jnp.pi
        k = jnp.round((phi - psi) / two_pi)
        phi = psi + two_pi * k

    return jnp.where(mask, phi, jnp.nan).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("cg_iters", "congruent",
                                             "downsample"))
def unwrap_wls(wrapped: jnp.ndarray, mask: jnp.ndarray,
               cg_iters: int = 30, tol: float = 1e-8,
               congruent: bool = True, downsample: int = 1) -> jnp.ndarray:
    """Weighted least-squares unwrap of ``wrapped`` over ``mask``.

    Outside the mask the weights are zero, so those pixels do not constrain
    the solution.  The result is anchored so its masked mean equals the
    masked mean of the wrapped input (gauge fixing; the caller detrends and
    re-zeros anyway).

    ``congruent=True`` projects the smooth WLS solution back onto the
    lattice ``wrapped + 2*pi*k`` (Ghiglia & Pritt's congruence step).  The
    reference's quality-guided flood fill (``shape_ftp.py:1043-1080``) is
    congruent by construction — it accumulates exact wrapped differences —
    so without this step the WLS approximation error spreads smoothly over
    the whole map (and the k-rounding of any path method turns into
    hypersensitivity to ~1e-3 px alignment changes near steep fringes).
    With it, disagreements collapse to isolated exact-2*pi pixels that the
    robust detrend downweights.

    ``downsample=d`` solves the WLS system on a dxd-pooled grid and
    bilinearly upsamples the SMOOTH solution before the full-resolution
    gauge + congruence projection (d^2 less PCG work — the 4K deploy
    path).  Because the projection snaps to ``wrapped + 2*pi*k`` exactly,
    the coarse solve only needs to be within pi of the smooth field; the
    demodulated phase is far smoother than d px, so disagreements vs the
    full-res solve are the same isolated exact-2*pi pixels the congruence
    step already produces.  Pooling happens in the complex domain
    (angle of the masked phasor-sum) so wrapped values never average
    across a branch cut."""
    psi = jnp.where(mask, wrapped, 0.0).astype(jnp.float32)
    m = mask.astype(jnp.float32)

    if downsample > 1:
        d = int(downsample)
        h, w = psi.shape
        Hp, Wp = -(-h // d) * d, -(-w // d) * d
        pad = lambda a: jnp.pad(a, ((0, Hp - h), (0, Wp - w)))
        pool = lambda a: pad(a).reshape(Hp // d, d, Wp // d, d).sum(axis=(1, 3))
        zr, zi = pool(jnp.cos(psi) * m), pool(jnp.sin(psi) * m)
        mc = pool(m)
        psi_c = jnp.arctan2(zi, zr)
        phi_c = _wls_pcg_solve(jnp.where(mc > 0, psi_c, 0.0),
                               (mc > 0).astype(jnp.float32), cg_iters, tol)
        # 'linear' half-pixel centers are exactly the average-pool block
        # centers, so the upsample is alignment-exact
        phi = jax.image.resize(phi_c, (Hp, Wp), method="linear")[:h, :w]
    else:
        phi = _wls_pcg_solve(psi, m, cg_iters, tol)

    return _gauge_and_project(phi, psi, m, mask, congruent)

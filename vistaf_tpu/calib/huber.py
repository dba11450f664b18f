"""Huber regression trainer matching sklearn.HuberRegressor semantics.

sklearn minimizes, over (w, c, sigma > 0):

    sum_i sigma + H_eps((y_i - x_i.w - c) / sigma) * sigma  +  alpha * ||w||^2

with H_eps(z) = z^2 for |z| <= eps else 2*eps*|z| - eps^2, via L-BFGS.  Here
the same objective is minimized with plain NumPy L-BFGS-free iterations:
alternating IRLS on (w, c) and a 1-D Newton solve for sigma, which converges
to the same stationary point (the objective is jointly convex in
(w, c, sigma) after the Owen reparametrization it uses).

Used by the temperature-model trainers (``temperature_color_model.py:333-342``).
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class HuberFit:
    coef: np.ndarray
    intercept: float
    sigma: float
    n_iter: int

    def predict(self, X: np.ndarray) -> np.ndarray:
        return X @ self.coef + self.intercept


def _objective(X, y, w, c, sigma, eps, alpha):
    r = (y - X @ w - c) / sigma
    a = np.abs(r)
    h = np.where(a <= eps, r * r, 2 * eps * a - eps * eps)
    return float(np.sum(sigma + h * sigma) + alpha * np.dot(w, w))


def huber_fit(X: np.ndarray, y: np.ndarray, epsilon: float = 1.35,
              alpha: float = 1e-4, max_iter: int = 200,
              tol: float = 1e-10) -> HuberFit:
    """Fit the sklearn Huber objective by alternating minimization.

    For fixed sigma, (w, c) minimize a reweighted ridge problem; for fixed
    (w, c), sigma has a closed Newton update.  Alternation converges to the
    joint optimum for this convex objective.
    """
    X = np.asarray(X, np.float64)
    y = np.asarray(y, np.float64)
    n, d = X.shape

    # init: OLS + residual scale
    A = np.column_stack([X, np.ones(n)])
    beta, *_ = np.linalg.lstsq(A, y, rcond=None)
    w = beta[:d].copy()
    c = float(beta[d])
    r = y - X @ w - c
    sigma = max(1.4826 * float(np.median(np.abs(r - np.median(r)))), 1e-7)

    obj = _objective(X, y, w, c, sigma, epsilon, alpha)
    it = 0
    for it in range(max_iter):
        # --- IRLS for (w, c) at fixed sigma.
        # d/dw of sum H(r/sigma)*sigma: weights w_i = 1 if |z|<=eps else eps/|z|
        z = (y - X @ w - c) / sigma
        az = np.abs(z)
        wts = np.where(az <= epsilon, 1.0, epsilon / np.maximum(az, 1e-300))
        Xa = np.column_stack([X, np.ones(n)])
        # weighted normal equations + ridge on w only (not the intercept)
        Hmat = (Xa * wts[:, None]).T @ Xa
        Hmat[:d, :d] += alpha * sigma * np.eye(d)
        g = (Xa * wts[:, None]).T @ y
        beta = np.linalg.solve(Hmat + 1e-12 * np.eye(d + 1), g)
        w_new = beta[:d]
        c_new = float(beta[d])

        # --- sigma update at fixed (w, c): minimize n*sigma + sum H(r/sigma)*sigma
        r = y - X @ w_new - c_new
        for _ in range(50):
            z = r / sigma
            az = np.abs(z)
            inl = az <= epsilon
            # f(sigma) = n*sigma + sum_inl r^2/sigma + sum_out (2 eps |r| - eps^2 sigma)
            # df/dsigma = n - sum_inl r^2/sigma^2 - eps^2 * n_out
            n_out = float(np.sum(~inl))
            s2 = float(np.sum(r[inl] ** 2))
            df = n - s2 / (sigma * sigma) - epsilon * epsilon * n_out
            d2f = 2.0 * s2 / (sigma ** 3)
            if d2f <= 0:
                break
            step = df / d2f
            sigma_new = max(sigma - step, 1e-10)
            if abs(sigma_new - sigma) < 1e-12 * max(sigma, 1.0):
                sigma = sigma_new
                break
            sigma = sigma_new

        w, c = w_new, c_new
        new_obj = _objective(X, y, w, c, sigma, epsilon, alpha)
        if abs(obj - new_obj) <= tol * max(abs(obj), 1.0):
            obj = new_obj
            break
        obj = new_obj

    return HuberFit(coef=w, intercept=c, sigma=float(sigma), n_iter=it + 1)


@dataclasses.dataclass
class HuberPolyPipeline:
    """StandardScaler -> PolynomialFeatures -> Huber, as plain arrays
    (the trainer-side twin of calib.temp_weights.TempModelWeights)."""
    scaler_mean: np.ndarray
    scaler_scale: np.ndarray
    powers: np.ndarray
    fit_: HuberFit
    degree: int

    def predict(self, X: np.ndarray) -> np.ndarray:
        Xs = (np.asarray(X, np.float64) - self.scaler_mean) / self.scaler_scale
        P = np.prod(Xs[:, None, :] ** self.powers[None, :, :], axis=-1)
        return P @ self.fit_.coef + self.fit_.intercept


def fit_huber_poly(X: np.ndarray, y: np.ndarray, degree: int,
                   epsilon: float, alpha: float,
                   max_iter: int = 10000) -> HuberPolyPipeline:
    """The reference's make_huber_poly_model pipeline
    (``temperature_color_model.py:333-342``), trained with our solver."""
    from vistaf_tpu.calib.temp_weights import poly_powers

    X = np.asarray(X, np.float64)
    mean = X.mean(axis=0)
    std = X.std(axis=0)
    std = np.where(std < 1e-12, 1.0, std)
    Xs = (X - mean) / std
    powers = poly_powers(X.shape[1], degree).astype(np.int64)
    P = np.prod(Xs[:, None, :] ** powers[None, :, :], axis=-1)
    fit = huber_fit(P, y, epsilon=epsilon, alpha=alpha, max_iter=min(max_iter, 500))
    return HuberPolyPipeline(mean, std, powers, fit, degree)

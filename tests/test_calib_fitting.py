import numpy as np
import pytest

from vistaf_tpu.calib import fitting, huber, isotonic, groupkfold


def test_lm_growth_matches_scipy(rng):
    from scipy.optimize import curve_fit
    x = np.linspace(0, 0.25, 75)
    true = 1.6 * (np.exp(9.7 * x) - 1.0)
    y = true + rng.normal(scale=2.0, size=x.shape)
    y = np.maximum(y, 0.0)

    ours = fitting.fit_growth(x, y)
    popt, _ = curve_fit(lambda v, a, b: a * (np.exp(b * np.maximum(v, 0)) - 1), x, y,
                        p0=[max(y.max(), 1e-6), 1.0], bounds=([0, 0], [np.inf, np.inf]),
                        maxfev=200000)
    np.testing.assert_allclose([ours["params"]["a"], ours["params"]["b"]], popt, rtol=1e-3)


def test_lm_hinge_matches_scipy(rng):
    from scipy.optimize import curve_fit

    def hinge(x, a, b, c):
        return a * ((1 - np.exp(-b * np.maximum(x - c, 0))) - (1 - np.exp(-b * np.maximum(-c, 0))))

    x = np.array([0.5, 0.65, 0.8, 1.0])
    y = np.array([1.90935, 1.9477, 2.01821, 2.07255])
    ours = fitting.fit_hinge_saturating(x, y)
    xmax = x.max()
    popt, _ = curve_fit(hinge, x, y, p0=[max(y.max(), 1e-6), 2.0, 0.2 * xmax],
                        bounds=([0, 0, -0.5 * xmax], [np.inf, np.inf, 1.2 * xmax]),
                        maxfev=200000)
    ours_yhat = ours["yhat"]
    ref_yhat = hinge(x, *popt)
    # parameter space is degenerate for n=4; compare fit quality instead
    assert np.sum((y - ours_yhat) ** 2) <= np.sum((y - ref_yhat) ** 2) * 1.05


def test_closed_forms(rng):
    x = rng.random(40) * 3 + 0.1
    y = 2.5 * x + 1.0 + rng.normal(scale=0.01, size=40)
    m = fitting.fit_linear(x, y)
    np.testing.assert_allclose([m["params"]["a"], m["params"]["b"]], [2.5, 1.0], atol=0.02)

    m0 = fitting.fit_linear0(x, 3.3 * x)
    np.testing.assert_allclose(m0["params"]["a"], 3.3, rtol=1e-6)

    me = fitting.fit_exp(x, 0.5 * np.exp(1.2 * x))
    np.testing.assert_allclose([me["params"]["a"], me["params"]["b"]], [0.5, 1.2], rtol=1e-5)

    mp = fitting.fit_power(x, 2.0 * x ** 1.5)
    np.testing.assert_allclose([mp["params"]["a"], mp["params"]["b"]], [2.0, 1.5], rtol=1e-5)


def test_fit_best_model_ranks_by_rmse(rng):
    x = np.linspace(0, 0.3, 50)
    y = 1.6 * (np.exp(9.7 * x) - 1.0) + rng.normal(scale=0.5, size=50)
    y = np.maximum(y, 0)
    best, summary = fitting.fit_best_model(
        x, y, ["linear0", "linear", "poly2", "sat_exp", "growth", "hinge_saturating"])
    assert summary == sorted(summary, key=lambda d: d["rmse"])
    assert best["rmse"] == summary[0]["rmse"]


def test_huber_matches_sklearn(rng):
    from sklearn.linear_model import HuberRegressor
    X = rng.normal(size=(400, 3))
    w_true = np.array([2.0, -1.0, 0.5])
    y = X @ w_true + 0.3 + rng.normal(scale=0.1, size=400)
    y[::50] += 8.0  # outliers

    ours = huber.huber_fit(X, y, epsilon=1.35, alpha=1e-4)
    sk = HuberRegressor(epsilon=1.35, alpha=1e-4, max_iter=10000).fit(X, y)
    np.testing.assert_allclose(ours.coef, sk.coef_, atol=5e-3)
    assert abs(ours.intercept - sk.intercept_) < 5e-3


def test_huber_poly_pipeline_matches_sklearn(rng):
    from sklearn.preprocessing import PolynomialFeatures, StandardScaler
    from sklearn.pipeline import make_pipeline
    from sklearn.linear_model import HuberRegressor
    X = rng.normal(size=(300, 3)) * np.array([25, 15, 20]) + np.array([130, 165, 90])
    y = 0.05 * X[:, 0] - 0.1 * X[:, 1] + 0.02 * X[:, 2] + rng.normal(scale=0.5, size=300) + 10

    ours = huber.fit_huber_poly(X, y, degree=2, epsilon=1.2, alpha=1e-6)
    sk = make_pipeline(StandardScaler(), PolynomialFeatures(2, include_bias=True),
                       HuberRegressor(epsilon=1.2, alpha=1e-6, max_iter=10000)).fit(X, y)
    xq = rng.normal(size=(50, 3)) * np.array([25, 15, 20]) + np.array([130, 165, 90])
    np.testing.assert_allclose(ours.predict(xq), sk.predict(xq), atol=0.02)


def test_isotonic_matches_sklearn(rng):
    from sklearn.isotonic import IsotonicRegression
    x = rng.normal(size=200) * 5 + 25
    y = x + rng.normal(scale=1.0, size=200)
    xt, yt = isotonic.fit_isotonic(x, y)
    sk = IsotonicRegression(out_of_bounds="clip").fit(x, y)
    q = np.linspace(10, 40, 101)
    np.testing.assert_allclose(isotonic.isotonic_predict(xt, yt, q), sk.predict(q), atol=1e-8)


def test_groupkfold_matches_sklearn():
    from sklearn.model_selection import GroupKFold
    groups = np.repeat(np.arange(14), 5)
    X = np.zeros((len(groups), 1))
    y = np.zeros(len(groups))
    ours = list(groupkfold.group_kfold_split(X, y, groups, 6))
    sk = list(GroupKFold(n_splits=6).split(X, y, groups))
    for (otr, ote), (str_, ste) in zip(ours, sk):
        np.testing.assert_array_equal(np.sort(ote), np.sort(ste))

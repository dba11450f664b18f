import numpy as np
import jax.numpy as jnp

from vistaf_tpu.ops import percentile


def test_masked_percentile_matches_numpy(rng):
    x = rng.normal(size=(50, 60)).astype(np.float32)
    mask = rng.random((50, 60)) > 0.4
    x[rng.random((50, 60)) > 0.95] = np.nan
    for q in [1.0, 25.0, 50.0, 92.0, 99.7]:
        ours = float(percentile.masked_percentile(jnp.asarray(x), jnp.asarray(mask), q))
        vals = x[mask]
        vals = vals[np.isfinite(vals)]
        ref = float(np.percentile(vals, q))
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_masked_percentile_empty_fallback():
    x = jnp.ones((8, 8))
    mask = jnp.zeros((8, 8), dtype=bool)
    assert float(percentile.masked_percentile(x, mask, 50.0, fallback=7.0)) == 7.0


def test_hist_percentile_close_to_exact(rng):
    x = rng.normal(size=(200, 200)).astype(np.float32) * 10
    mask = rng.random((200, 200)) > 0.2
    for q in [25.0, 50.0, 92.0]:
        approx = float(percentile.masked_percentile_hist(jnp.asarray(x), jnp.asarray(mask), q))
        ref = float(np.percentile(x[mask], q))
        assert abs(approx - ref) < 0.02, (q, approx, ref)


def test_masked_minmax_mean(rng):
    x = rng.normal(size=(20, 20)).astype(np.float32)
    mask = rng.random((20, 20)) > 0.5
    np.testing.assert_allclose(float(percentile.masked_min(jnp.asarray(x), jnp.asarray(mask))), x[mask].min(), rtol=1e-6)
    np.testing.assert_allclose(float(percentile.masked_max(jnp.asarray(x), jnp.asarray(mask))), x[mask].max(), rtol=1e-6)
    np.testing.assert_allclose(float(percentile.masked_mean(jnp.asarray(x), jnp.asarray(mask))), x[mask].mean(), rtol=1e-5)


def test_hist_multi_matches_single(rng):
    from vistaf_tpu.ops.percentile import (masked_percentile_hist,
                                           masked_percentile_hist_multi,
                                           masked_percentile_hist_rows)
    import jax.numpy as jnp
    x = rng.normal(size=(90, 110)).astype(np.float32) * 7 + 3
    m = rng.random((90, 110)) > 0.25
    multi = np.asarray(masked_percentile_hist_multi(jnp.asarray(x), jnp.asarray(m), (25.0, 92.0, 99.7)))
    n = int(m.sum())
    for i, q in enumerate((25.0, 92.0, 99.7)):
        single = float(masked_percentile_hist(jnp.asarray(x), jnp.asarray(m), q))
        if q < 99.0:
            exact = np.percentile(x[m], q)
            assert abs(multi[i] - exact) < 1e-3 * (x[m].max() - x[m].min())
        else:
            # extreme-tail percentiles carry the local order-stat spacing on
            # top of the bracket resolution; assert on the RANK instead
            rank = (x[m] <= multi[i]).sum()
            assert abs(rank - q / 100.0 * (n - 1)) <= 3
        assert abs(multi[i] - single) < 1e-3 * (x[m].max() - x[m].min())

    rows = np.asarray(masked_percentile_hist_rows(
        jnp.asarray(np.stack([x.ravel(), (x * 2 + 1).ravel()])),
        jnp.asarray(np.stack([m.ravel(), m.ravel()])), (99.9, 50.0)))
    rank = (x[m] <= rows[0]).sum()
    assert abs(rank - 0.999 * (n - 1)) <= 3
    assert abs(rows[1] - np.percentile(x[m] * 2 + 1, 50.0)) < 2e-3 * np.ptp(x[m])

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

"""Fused Pallas masked-quantile kernel vs the XLA histogram reference
(interpret mode on CPU; the real-TPU path is exercised by the bench)."""
import numpy as np
import jax.numpy as jnp

from vistaf_tpu.ops.percentile import masked_percentile_hist
from vistaf_tpu.pallas.quantile_kernel import (masked_median_mad_pallas,
                                               masked_quantiles_pallas)


def test_quantiles_match_hist(rng):
    x = (rng.normal(size=(150, 201)) * 5 + 2).astype(np.float32)
    m = rng.random((150, 201)) > 0.3
    qs = (25.0, 50.0, 92.0)
    ours = np.asarray(masked_quantiles_pallas(jnp.asarray(x), jnp.asarray(m),
                                              qs, interpret=True))
    for i, q in enumerate(qs):
        gold = float(masked_percentile_hist(jnp.asarray(x), jnp.asarray(m), q))
        assert abs(ours[i] - gold) < 1e-4 * np.ptp(x[m]), (q, ours[i], gold)


def test_median_mad_match(rng):
    x = (rng.normal(size=(90, 130)) * 3).astype(np.float32)
    x[10:20, 10:30] += 40.0   # outlier block, like a contact region
    m = rng.random((90, 130)) > 0.2
    med, mad = masked_median_mad_pallas(jnp.asarray(x), jnp.asarray(m),
                                        interpret=True)
    gmed = np.median(x[m])
    gmad = np.median(np.abs(x[m] - gmed))
    rng_span = np.ptp(x[m])
    assert abs(float(med) - gmed) < 2e-3 * rng_span
    assert abs(float(mad) - gmad) < 4e-3 * rng_span

"""Fused Pallas masked-quantile kernel vs the XLA histogram reference.

Numerics run here in interpret mode on CPU.  The real-chip existence proof
is ``test_real_tpu_smoke`` (subprocess without the CPU-platform forcing,
gated on VISTAF_RUN_TPU=1); measured outcomes are recorded in
``FTPConfig.deploy`` (round 3: in-kernel bisection took the deploy pipeline
3.14 -> 1.78 ms at bench scale), which is why ``hist_pallas`` is the deploy
default.  Arrays beyond the ~12.5 MB VMEM residency budget fall back to the
XLA bisection ladder (``test_vmem_fallback``).
"""
import os
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from vistaf_tpu.ops.percentile import masked_percentile_hist
from vistaf_tpu.pallas.quantile_kernel import (_fits_vmem,
                                               masked_median_mad_pallas,
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


def test_vmem_fallback(rng, monkeypatch):
    """Above the VMEM budget the entry points must route to the XLA
    bisection ladder (equal-or-tighter bracket, ~16x less compute at 4K
    plane sizes) instead of attempting an un-lowerable pallas_call.

    The budget routing is checked at the real constant (native-4K crop
    sizes are over budget, bench sizes under); the fallback NUMERICS run
    at a reduced size with the budget monkeypatched below it — on the CPU
    backend the ladder at a true 1747^2 plane costs ~2.5 min of test time
    for no extra code coverage (the ladder is size-oblivious)."""
    assert not _fits_vmem(np.empty((1747, 1747), np.float32))  # 4K crop
    assert _fits_vmem(np.empty((1280, 1280), np.float32))
    import vistaf_tpu.pallas.quantile_kernel as qk
    monkeypatch.setattr(qk, "_VMEM_BUDGET_BYTES", 100_000)
    big = (301, 437)   # over the patched budget -> XLA ladder route
    assert not qk._fits_vmem(np.empty(big, np.float32))
    x = jnp.asarray(rng.normal(size=big).astype(np.float32))
    m = jnp.asarray(rng.random(big) > 0.3)
    from vistaf_tpu.ops.percentile import masked_percentile_hist_multi
    q = masked_quantiles_pallas(x, m, (25.0, 92.0))
    gold = masked_percentile_hist_multi(x, m, (25.0, 92.0))
    span = float(np.ptp(np.asarray(x)[np.asarray(m)]))
    # both estimates sit inside brackets <= span/128^3 resp. span/2^21
    np.testing.assert_allclose(np.asarray(q), np.asarray(gold),
                               atol=2e-6 * span)
    med, mad = masked_median_mad_pallas(x, m)   # default refine=1
    gmed = float(masked_percentile_hist(x, m, 50.0, refine=1))
    assert abs(float(med) - gmed) < 2e-4 * span   # span/128^2 + span/2^16
    assert float(mad) > 0


_TPU_SMOKE = r"""
import numpy as np, jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()[0].platform
from vistaf_tpu.pallas.quantile_kernel import (masked_median_mad_pallas,
                                               masked_quantiles_pallas)
from vistaf_tpu.ops.percentile import masked_percentile_hist
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(480, 640)).astype(np.float32))
m = jnp.asarray(rng.random((480, 640)) > 0.3)
q = masked_quantiles_pallas(x, m, (25.0, 50.0, 92.0))
for i, qq in enumerate((25.0, 50.0, 92.0)):
    gold = float(masked_percentile_hist(x, m, qq))
    assert abs(float(q[i]) - gold) < 1e-5, (qq, float(q[i]), gold)
med, mad = masked_median_mad_pallas(x, m)
assert np.isfinite(float(med)) and float(mad) > 0
print("TPU_PALLAS_OK")
"""


@pytest.mark.skipif(os.environ.get("VISTAF_RUN_TPU") != "1",
                    reason="real-TPU smoke (set VISTAF_RUN_TPU=1)")
def test_real_tpu_smoke():
    """Compile + run the fused kernels on the real chip (the test session
    itself forces the CPU platform, so this spawns a clean process)."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    out = subprocess.run([sys.executable, "-c", _TPU_SMOKE],
                         env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "TPU_PALLAS_OK" in out.stdout

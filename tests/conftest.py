"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that the multi-chip sharding paths
(`vistaf_tpu.parallel`) can be exercised without TPU hardware, mirroring the
reference's absence of any distributed prior art (SURVEY.md §4).

Must set env vars before the first `import jax` anywhere in the test session.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The hosting environment pre-selects an experimental TPU platform plugin;
# the env var alone does not override it once absl flags are parsed, so force
# the config flag too (must happen before the first backend use).
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

from vistaf_tpu.utils.jaxcache import enable as _enable_jax_cache
_enable_jax_cache()


def pytest_collection_modifyitems(config, items):
    """Slow full-resolution golden tests run only when explicitly requested
    (VISTAF_RUN_SLOW=1 or -m slow) — they re-run the 4K pipelines on the CPU
    backend and take minutes each."""
    if os.environ.get("VISTAF_RUN_SLOW") == "1":
        return
    if config.getoption("-m", default="") and "slow" in config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow golden test (set VISTAF_RUN_SLOW=1)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture()
def rng():
    # Function-scoped: each test sees the same draws regardless of suite
    # ordering (a session-scoped generator made tolerance-tuned tests flaky
    # whenever tests were added/reordered upstream of them).
    return np.random.default_rng(0)

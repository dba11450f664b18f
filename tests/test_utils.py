import os
import re

import numpy as np
import jax.numpy as jnp

from vistaf_tpu.utils.logging import RunLogger, array_stats, array_stats_device
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair


def test_array_stats_format(rng, tmp_path):
    x = rng.normal(size=(32, 32)).astype(np.float32)
    logger = RunLogger(str(tmp_path), debug=True)
    msg = array_stats("test_arr", x, logger=logger)
    logger.close()
    assert msg.startswith("[STATS] test_arr:")
    assert "median=" in msg and "p99=" in msg
    assert (tmp_path / "debug_log.txt").read_text().startswith("[STATS]")


def test_array_stats_device_matches_numpy(rng):
    x = rng.normal(size=(64, 64)).astype(np.float32)
    mask = rng.random((64, 64)) > 0.3
    out = np.asarray(array_stats_device(jnp.asarray(x), jnp.asarray(mask)))
    vals = x[mask]
    ref = np.quantile(vals, [0, 0.01, 0.05, 0.5, 0.95, 0.99, 1.0])
    np.testing.assert_allclose(out[:7], ref, atol=1e-3)
    np.testing.assert_allclose(out[7], vals.mean(), atol=1e-4)
    np.testing.assert_allclose(out[8], vals.std(), atol=1e-3)


def test_scaled_config_geometry():
    cfg = scaled_ftp_config(480, 640)
    assert cfg.image_height == 480 and cfg.image_width == 640
    # scaled circle must stay inside the frame
    from vistaf_tpu.ops.geometry import circle_from_3_points
    cx, cy, r = circle_from_3_points(cfg.outer_circle_p1, cfg.outer_circle_p2,
                                     cfg.outer_circle_p3)
    assert 0 < cx < 640 and 0 < cy < 480
    assert r > 40


def test_synthetic_pair_has_carrier():
    cfg = scaled_ftp_config(144, 192)
    ref, de = synthetic_pair(144, 192, cfg)
    assert ref.shape == (144, 192, 3) and ref.dtype == np.uint8
    # strong horizontal carrier: FFT row spectrum has an off-DC peak
    g = ref[..., 0].astype(float)
    spec = np.abs(np.fft.rfft(g - g.mean(), axis=1)).mean(axis=0)
    assert spec[3:].max() > 10 * np.median(spec[3:])


def test_jaxcache_path_is_host_keyed(tmp_path, monkeypatch):
    """Cache entries must live under a per-host CPU-fingerprint subdir so a
    checkout carried to a different machine never deserializes foreign
    XLA:CPU AOT code (SIGILL hazard — see round-3 MULTICHIP loader errors)."""
    import jax

    from vistaf_tpu.utils import jaxcache

    fp = jaxcache.host_fingerprint()
    assert len(fp) == 12 and all(c in "0123456789abcdef" for c in fp)
    # deterministic on the same host
    assert jaxcache.host_fingerprint() == fp

    monkeypatch.setenv("VISTAF_JAX_CACHE", str(tmp_path))
    jaxcache.enable()
    try:
        got = jax.config.jax_compilation_cache_dir
        assert got == os.path.join(str(tmp_path), f"host-{fp}")
        assert os.path.isdir(got)
    finally:
        # restore the session-wide cache dir set by conftest
        jaxcache.enable()

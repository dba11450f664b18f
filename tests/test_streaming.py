import numpy as np
import jax.numpy as jnp

from vistaf_tpu.pipelines import streaming


def test_streaming_update_statistics():
    state = streaming.init_state(n_streams=3, window=4)
    seq = [np.array([1.0, 0.0, 5.0]), np.array([2.0, 0.0, 5.0]),
           np.array([3.0, 0.0, 5.0])]
    for f in seq:
        state, out = streaming.update(state, jnp.asarray(f))
    np.testing.assert_allclose(out["force_mean_N"], [2.0, 0.0, 5.0], atol=1e-6)
    np.testing.assert_allclose(out["force_median_N"], [2.0, 0.0, 5.0], atol=1e-6)
    assert out["in_contact"].tolist() == [True, False, True]
    np.testing.assert_allclose(float(out["total_force_N"]), 7.0, atol=1e-6)


def test_streaming_ring_wraps():
    state = streaming.init_state(n_streams=1, window=3)
    for v in [10.0, 10.0, 10.0, 1.0, 1.0, 1.0]:
        state, out = streaming.update(state, jnp.asarray([v]))
    # window fully replaced by 1.0s
    np.testing.assert_allclose(out["force_median_N"], [1.0], atol=1e-6)


def test_contact_hysteresis():
    state = streaming.init_state(n_streams=1, window=1)
    state, out = streaming.update(state, jnp.asarray([0.2]))
    assert not bool(out["in_contact"][0])          # below on-threshold
    state, out = streaming.update(state, jnp.asarray([0.5]))
    assert bool(out["in_contact"][0])              # engaged
    state, out = streaming.update(state, jnp.asarray([0.2]))
    assert bool(out["in_contact"][0])              # stays (above off-threshold)
    state, out = streaming.update(state, jnp.asarray([0.05]))
    assert not bool(out["in_contact"][0])          # released

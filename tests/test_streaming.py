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


def test_run_overlapped_matches_serialized():
    """Double-buffered ingest must produce exactly the serialized results
    (same state evolution, same outputs) — only the upload scheduling
    differs."""
    class FakeBatched:
        def batched(self):
            def fn(refs, frames):
                f = jnp.mean(frames.astype(jnp.float32), axis=(1, 2, 3))
                return {"force_N": f, "max_depth_mm": f * 0.1}
            return fn

    S = 3
    sf_a = streaming.StreamingForce(FakeBatched(), S, window=4)
    sf_b = streaming.StreamingForce(FakeBatched(), S, window=4)
    rng = np.random.default_rng(0)
    refs = rng.integers(0, 255, size=(S, 8, 8, 3)).astype(np.uint8)
    seq = [rng.integers(0, 255, size=(S, 8, 8, 3)).astype(np.uint8)
           for _ in range(6)]

    outs_overlap = sf_a.run_overlapped(refs, seq)
    outs_serial = [sf_b(refs, fb) for fb in seq]
    assert len(outs_overlap) == len(outs_serial) == 6
    for a, b in zip(outs_overlap, outs_serial):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=0, atol=0)


def test_run_overlapped_empty_sequence():
    class FakeBatched:
        def batched(self):
            return lambda refs, frames: {
                "force_N": jnp.zeros(frames.shape[0]),
                "max_depth_mm": jnp.zeros(frames.shape[0])}

    sf = streaming.StreamingForce(FakeBatched(), 2, window=4)
    assert sf.run_overlapped(np.zeros((2, 4, 4, 3), np.uint8), []) == []

"""Multi-chip sharding paths on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax


def test_virtual_devices_available():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip_8():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_small():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__
    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert np.isfinite(float(out["force_N"]))
    # synthetic dent must register as contact
    assert float(out["max_depth_mm"]) > 0.01


def test_whole_limb_map_assembly_on_mesh():
    """BASELINE config 5: the fusion head must assemble a cross-stream
    whole-limb contact map (not just scalars), via explicit ICI collectives
    with the varying-axis type check ON (no check_vma escape hatch)."""
    import jax.numpy as jnp
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.parallel.mesh import (BatchedForce, make_stream_mesh,
                                          shard_batch, whole_limb_step)
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W, n = 144, 192, 8
    cfg = scaled_ftp_config(H, W).replace(
        percentile_method="hist", unwrap_cg_iters=8, ecc_iters=20,
        inpaint_iters=8)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    pipe = FTPPipeline(cfg, p2h)
    bf = BatchedForce(pipe, {"type": "growth", "params": {"a": 1.62, "b": 9.76}})
    mesh = make_stream_mesh(n)
    step = whole_limb_step(bf, mesh, map_stride=2)

    ref, de = synthetic_pair(H, W, cfg)
    ref_b = shard_batch(mesh, jnp.asarray(np.broadcast_to(ref, (n,) + ref.shape).copy()))
    def_b = shard_batch(mesh, jnp.asarray(np.broadcast_to(de, (n,) + de.shape).copy()))
    out = step(ref_b, def_b)
    jax.block_until_ready(out)

    limb = np.asarray(out["whole_limb_map_mm"])
    assert limb.ndim == 3 and limb.shape[0] == n
    # identical streams -> identical per-patch maps, nonzero contact
    assert limb.max() > 0.01
    np.testing.assert_allclose(limb[0], limb[n - 1], atol=1e-6)
    # map is consistent with the scalar summaries it rode along with
    assert abs(float(out["max_depth_mm"]) - limb.max()) < 1e-5
    forces = np.asarray(out["per_stream_force"])
    np.testing.assert_allclose(float(out["total_force_N"]), forces.sum(), rtol=1e-6)


def test_whole_limb_map_negative_indentation_sign():
    """With mm_keep_indentation_negative=True the heightmap keeps indentation
    negative; the limb map must auto-detect the sign (mirroring
    depth_map_to_volume_cm3 / force_sensor.py:106-108) instead of going
    all-zero."""
    import jax.numpy as jnp
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.parallel.mesh import (BatchedForce, make_stream_mesh,
                                          shard_batch, whole_limb_step)
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W, n = 144, 192, 8
    cfg = scaled_ftp_config(H, W).replace(
        percentile_method="hist", unwrap_cg_iters=8, ecc_iters=20,
        inpaint_iters=8, mm_keep_indentation_negative=True)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    pipe = FTPPipeline(cfg, p2h)
    bf = BatchedForce(pipe, {"type": "growth", "params": {"a": 1.62, "b": 9.76}})
    mesh = make_stream_mesh(n)
    step = whole_limb_step(bf, mesh, map_stride=2)

    ref, de = synthetic_pair(H, W, cfg)
    ref_b = shard_batch(mesh, jnp.asarray(np.broadcast_to(ref, (n,) + ref.shape).copy()))
    def_b = shard_batch(mesh, jnp.asarray(np.broadcast_to(de, (n,) + de.shape).copy()))
    out = step(ref_b, def_b)
    jax.block_until_ready(out)

    limb = np.asarray(out["whole_limb_map_mm"])
    assert limb.max() > 0.01  # nonzero contact despite negative-kept heights
    assert abs(float(out["max_depth_mm"]) - limb.max()) < 1e-5


def test_initialize_multihost_single_process_noop(monkeypatch):
    """Without the multi-process env contract the bring-up is a no-op; with
    it (but no real coordinator) the intent is detected."""
    from vistaf_tpu.parallel import distributed as d
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert not d.is_multihost_env()
    assert d.initialize_multihost() is False

    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    assert d.is_multihost_env()
    monkeypatch.setenv("JAX_NUM_PROCESSES", "1")
    assert not d.is_multihost_env()
    # malformed numeric env vars are ignored, not a crash
    monkeypatch.setenv("JAX_NUM_PROCESSES", "four")
    assert not d.is_multihost_env()
    assert d._env_int("JAX_NUM_PROCESSES") is None
    import jax
    assert d.global_stream_count() == jax.device_count()

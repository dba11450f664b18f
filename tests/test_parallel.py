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


def _run_multihost(tmp_path, mode, timeout_s):
    """Spawn a 2-process jax.distributed CPU bring-up over a loopback
    coordinator (2 local devices each, stream mesh over all 4 global
    devices) and assert one whole-limb step's cross-process fusion."""
    import json
    import os
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS",
                        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                        "JAX_PROCESS_ID")}
    outs = [str(tmp_path / f"rank{i}.json") for i in range(2)]
    procs = [subprocess.Popen(
        [sys.executable, os.path.join(repo, "tests", "multihost_worker.py"),
         coord, str(i), "2", outs[i], mode],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout_s)
        logs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"rank {i} failed:\n{logs[i][-3000:]}"

    results = []
    for path in outs:
        with open(path) as f:
            results.append(json.load(f))
    for i, r in enumerate(results):
        assert r["process_id"] == i
        assert r["process_count"] == 2
        assert r["global_devices"] == 4
        assert len(r["per_stream_force"]) == 4
        assert r["limb_map_shape"][0] == 4
        assert r["limb_map_max"] > 0.01
        assert abs(sum(r["per_stream_force"]) - r["total_force_N"]) < 1e-5
        # identical synthetic streams -> identical per-stream forces,
        # including the two owned by the OTHER process
        fs = r["per_stream_force"]
        assert max(fs) - min(fs) < 1e-5
    # both ranks must agree on the replicated fusion outputs
    assert abs(results[0]["total_force_N"] - results[1]["total_force_N"]) < 1e-9
    assert results[0]["limb_map_max"] == results[1]["limb_map_max"]


def test_multihost_bringup_and_fusion():
    """Real 2-process jax.distributed bring-up: initialize_multihost joins a
    loopback coordinator, the stream mesh spans both processes, and the real
    whole_limb_step fusion head (shard_map psum/pmax over Gloo) runs over a
    cheap per-stream compute.  Exercises the bring-up path end-to-end rather
    than only its env-var parsing."""
    import tempfile
    from pathlib import Path
    with tempfile.TemporaryDirectory() as d:
        _run_multihost(Path(d), "fast", timeout_s=180)


@pytest.mark.slow
def test_multihost_whole_limb_step_full(tmp_path):
    """Same 2-process bring-up over the genuine FTP force pipeline at test
    scale (multi-minute XLA:CPU compile per rank -> slow suite)."""
    _run_multihost(tmp_path, "full", timeout_s=600)


def test_whole_limb_aux_streams_on_mesh():
    """BASELINE config 5's auxiliary-stream clause: proprioception poses
    place each patch on the shared limb canvas and the IMU motion gate
    downweights fast-moving (motion-blurred) streams — all inside the
    shard_map fusion with rep-checked collectives."""
    import jax.numpy as jnp
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.parallel.mesh import (BatchedForce, make_stream_mesh,
                                          motion_gate, shard_batch,
                                          whole_limb_step_aux)
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

    H, W, n = 144, 192, 8
    cfg = scaled_ftp_config(H, W).replace(
        percentile_method="hist", unwrap_cg_iters=8, ecc_iters=20,
        inpaint_iters=8)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    pipe = FTPPipeline(cfg, p2h)
    bf = BatchedForce(pipe, {"type": "growth", "params": {"a": 1.62, "b": 9.76}})
    mesh = make_stream_mesh(n)
    # 2x4 tile layout: patch maps are (72, 96) at stride 2; canvas holds
    # every stream's patch at a distinct, non-overlapping pose
    step = whole_limb_step_aux(bf, mesh, canvas_hw=(288, 768), map_stride=2)

    ref, de = synthetic_pair(H, W, cfg)
    ref_b = shard_batch(mesh, jnp.asarray(np.broadcast_to(ref, (n,) + ref.shape).copy()))
    def_b = shard_batch(mesh, jnp.asarray(np.broadcast_to(de, (n,) + de.shape).copy()))
    pose = np.array([[(k // 4) * 144, (k % 4) * 192] for k in range(n)],
                    np.int32)
    accel = np.zeros((n, 3), np.float32)
    accel[7] = (30.0, 0.0, 0.0)          # stream 7 moving fast -> gated out
    accel[6] = (0.0, 11.0, 0.0)          # halfway up the ramp -> gate 0.5
    aux = {"pose_px": shard_batch(mesh, jnp.asarray(pose)),
           "accel_mss": shard_batch(mesh, jnp.asarray(accel))}

    out = step(ref_b, def_b, aux)
    jax.block_until_ready(out)

    gates = np.asarray(out["stream_gate"])
    np.testing.assert_allclose(gates[:6], 1.0, atol=1e-6)
    np.testing.assert_allclose(gates[6], 0.5, atol=1e-6)
    np.testing.assert_allclose(gates[7], 0.0, atol=1e-6)
    assert np.allclose(gates, motion_gate(jnp.asarray(accel)))

    forces = np.asarray(out["per_stream_force"])
    # identical streams: gated forces scale exactly with the gate
    assert forces[0] > 0.0
    np.testing.assert_allclose(forces, forces[0] * gates, rtol=1e-5)
    np.testing.assert_allclose(float(out["total_force_N"]), forces.sum(),
                               rtol=1e-6)

    canvas = np.asarray(out["limb_canvas_mm"])
    assert canvas.shape == (144, 384)
    # stream 0's tile carries the (ungated) contact patch
    tile0 = canvas[0:72, 0:96]
    assert tile0.max() > 0.01
    assert abs(float(out["max_depth_mm"]) - canvas.max()) < 1e-5
    # stream 6's tile is the same patch at half weight
    tile6 = canvas[72:144, 192:288]
    np.testing.assert_allclose(tile6, 0.5 * tile0, atol=1e-6)
    # stream 7 was gated out: its tile stays empty
    tile7 = canvas[72:144, 288:384]
    assert tile7.max() == 0.0

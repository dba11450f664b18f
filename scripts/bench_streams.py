"""BASELINE configs 4/5 + temperature-path bench on the real chip.

- config 4: 4 skin-camera streams, batched 640x480 frame->force with the
  temporal-smoothing window (``pipelines/streaming.py``), one chip.
- config 5: whole-limb fusion head (``parallel/mesh.py::whole_limb_step``)
  over a 1-device stand-in mesh carrying all 4 streams; on a 4-chip mesh the
  per-chip load is the single-stream column, which the main bench measures
  at ~970 fps — the per-chip rate bound for the ICI-fused deployment.
- temperature: native-4K frame -> fused degC map steady-state latency
  (parity and deploy TempConfig presets).

All timings use the fetch-based method from bench.py (compile excluded).
Writes one JSON artifact.  Usage: python scripts/bench_streams.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vistaf_tpu.utils.jaxcache import enable as _enable

_enable()

import numpy as np

REF = "/root/reference"
H, W = 480, 640
N_STREAMS = 4
TARGET_HZ = 200.0


def _rtt(jax, jnp):
    triv = jax.jit(lambda x: x + 1.0)
    _ = float(triv(jnp.float32(1.0)))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(triv(jnp.float32(1.0)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def _time_steps(run_once, fetch, rtt, iters=20, rounds=5):
    per = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = run_once()
        fetch(out)
        per.append(max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
    _time_steps.last_stats = {
        "reps": rounds, "iters_per_rep": iters,
        "p10_ms": round(float(np.percentile(per, 10)) * 1000.0, 2),
        "p90_ms": round(float(np.percentile(per, 90)) * 1000.0, 2),
    }
    return float(np.percentile(per, 50))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    import bench
    from vistaf_tpu.config import TempConfig
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.parallel.mesh import (BatchedForce, make_stream_mesh,
                                          shard_batch, whole_limb_step)
    from vistaf_tpu.pipelines.streaming import StreamingForce
    from vistaf_tpu.temperature.inference import TemperaturePipeline
    from vistaf_tpu.utils.synthetic import scaled_ftp_config

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_streams.json"
    rtt = _rtt(jax, jnp)
    summary = {"n_streams": N_STREAMS, "resolution": f"{W}x{H}",
               "target_whole_limb_hz": TARGET_HZ, "rtt_ms": round(rtt * 1e3, 3)}

    # --- stream batch: 4 downscaled demo pairs (slightly jittered so the
    # streams are not bit-identical)
    cfg = scaled_ftp_config(H, W).deploy()
    ref = cv2.resize(cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg",
                                cv2.IMREAD_COLOR), (W, H), interpolation=cv2.INTER_AREA)
    de = cv2.resize(cv2.imread(f"{REF}/Final_demos_images/FINAL_E_deformed.jpg",
                               cv2.IMREAD_COLOR), (W, H), interpolation=cv2.INTER_AREA)
    rng = np.random.default_rng(0)
    refs = np.stack([ref] * N_STREAMS)
    defs = np.stack([np.clip(de.astype(np.int16)
                             + rng.integers(-2, 3, size=de.shape), 0, 255)
                     .astype(np.uint8) for _ in range(N_STREAMS)])

    p2h = {"type": "hinge_saturating",
           "params": {"a": 2.0826494996246554, "b": 4.20441143052732,
                      "c": -1.767844217125454e-09}}
    force_model = {"type": "growth",
                   "params": {"a": 1.6197727931063521, "b": 9.756634595755994}}
    pipe = FTPPipeline(cfg, p2h)
    bf = BatchedForce(pipe, force_model)

    # --- config 4: streaming smoother over the 4-stream batch
    sf = StreamingForce(bf, N_STREAMS, window=8)
    r_dev = jax.device_put(refs)
    d_dev = jax.device_put(defs)
    _ = sf(r_dev, d_dev)  # compile + warm
    state0 = sf._state

    def run4():
        nonlocal state0
        state0, out = sf._step(state0, r_dev, d_dev)
        return out

    p50_s = _time_steps(run4, lambda o: float(o["total_force_N"]), rtt)
    hz4 = 1.0 / p50_s
    summary["config4_streaming"] = {
        "step_p50_ms": round(p50_s * 1e3, 2),
        **_time_steps.last_stats,
        "batch_hz_per_chip": round(hz4, 1),
        "stream_frames_per_sec_per_chip": round(hz4 * N_STREAMS, 1),
    }
    print(f"config4 streaming: step p50 {p50_s*1e3:.2f} ms -> {hz4:.0f} Hz "
          f"({hz4*N_STREAMS:.0f} stream-frames/s on one chip)", flush=True)

    # --- config 5: whole-limb fusion head (1-device stand-in mesh)
    mesh = make_stream_mesh(1)
    step = whole_limb_step(bf, mesh, map_stride=2)
    rs = shard_batch(mesh, refs)
    ds = shard_batch(mesh, defs)
    out = step(rs, ds)  # compile + warm
    limb_shape = tuple(int(s) for s in out["whole_limb_map_mm"].shape)

    p50_s = _time_steps(lambda: step(rs, ds),
                        lambda o: float(o["total_force_N"]), rtt)
    hz5 = 1.0 / p50_s
    summary["config5_whole_limb"] = {
        "step_p50_ms": round(p50_s * 1e3, 2),
        **_time_steps.last_stats,
        "whole_limb_hz_one_chip_4_streams": round(hz5, 1),
        "limb_map_shape": limb_shape,
        "meets_200hz_one_chip": bool(hz5 >= TARGET_HZ),
        "note": ("4 streams time-multiplexed on ONE chip; on the 4-chip "
                 "deployment mesh each chip runs one stream (~970 fps, see "
                 "bench.py) and the fusion collectives ride ICI"),
    }
    print(f"config5 whole-limb: step p50 {p50_s*1e3:.2f} ms -> {hz5:.0f} Hz "
          f"(limb map {limb_shape})", flush=True)

    # --- config 5 with the auxiliary proprioception/IMU streams
    # (BASELINE configs[4] verbatim: "vision tactile + IMU/proprioception
    # streams -> whole-limb contact map at 200 Hz")
    from vistaf_tpu.parallel.mesh import whole_limb_step_aux
    canvas_hw = (2 * H, 2 * W)
    step_a = whole_limb_step_aux(bf, mesh, canvas_hw, map_stride=2)
    rng = np.random.default_rng(5)
    aux = {
        "pose_px": jax.device_put(np.stack([
            rng.integers(0, canvas_hw[0] - H, N_STREAMS),
            rng.integers(0, canvas_hw[1] - W, N_STREAMS)], axis=1)
            .astype(np.int32)),
        "accel_mss": jax.device_put(
            rng.normal(0.0, 1.0, (N_STREAMS, 3)).astype(np.float32)),
    }
    out = step_a(rs, ds, aux)  # compile + warm
    canvas_shape = tuple(int(s) for s in out["limb_canvas_mm"].shape)

    p50_s = _time_steps(lambda: step_a(rs, ds, aux),
                        lambda o: float(o["total_force_N"]), rtt)
    hz5a = 1.0 / p50_s
    summary["config5_whole_limb_aux"] = {
        "step_p50_ms": round(p50_s * 1e3, 2),
        **_time_steps.last_stats,
        "whole_limb_hz_one_chip_4_streams": round(hz5a, 1),
        "limb_canvas_shape": canvas_shape,
        "meets_200hz_one_chip": bool(hz5a >= TARGET_HZ),
        "note": ("config-5 head with pose-indexed placement + IMU motion "
                 "gating (parallel/mesh.py::whole_limb_step_aux)"),
    }
    print(f"config5 whole-limb+aux: step p50 {p50_s*1e3:.2f} ms -> "
          f"{hz5a:.0f} Hz (canvas {canvas_shape})", flush=True)

    # --- temperature path at native 4K
    img = cv2.imread(f"{REF}/Final_demos_images/FINAL_TEMP_DEMO.jpg",
                     cv2.IMREAD_COLOR)
    for mode in ("parity", "deploy"):
        tcfg = TempConfig().deploy() if mode == "deploy" else TempConfig()
        tp = TemperaturePipeline.from_artifacts(REF, cfg=tcfg)
        frame = jax.device_put(np.asarray(img))
        out = tp._forward(frame)  # compile + warm
        _ = float(out["t_mean"])

        def run_t():
            return tp._forward(frame)

        p50_s = _time_steps(run_t, lambda o: float(o["t_mean"]), rtt,
                            iters=5, rounds=4)
        summary[f"temperature_4k_{mode}"] = {
            "p50_ms": round(p50_s * 1e3, 1),
            **_time_steps.last_stats,
            "fps": round(1.0 / p50_s, 2),
        }
        print(f"temperature 4K {mode}: p50 {p50_s*1e3:.0f} ms "
              f"({1.0/p50_s:.2f} fps)", flush=True)

    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

"""Ingest-inclusive end-to-end benchmarks (BASELINE north-star: "camera
frame path ... existing acquisition scripts work").

Every other committed latency is device-resident compute; the reference's
per-frame cost includes JPEG decode and every host step
(``shape_ftp.py:1471-1478`` times cv2.imread inside main();
``multimodal_sensor.py:370-382``).  This bench commits the missing rows:

- native libjpeg decode (``native/vistaf_native.cpp``) per 4K frame;
- host->device upload per 24 MB frame (and the implied link bandwidth —
  on this dev machine the TPU sits behind a tunnel, so the absolute
  number is environment-specific; the breakdown lets a production reader
  substitute their PCIe cost);
- camera->force: decode -> upload -> deploy compute -> scalar fetch,
  serialized per frame (the reference's loop shape);
- multimodal per-frame upload variants: numpy frames into two sequential
  jit calls (2 uploads) vs ``MultimodalPipeline.ingest`` (1 upload,
  sequential graphs) vs the fused one-program step (1 upload) — settling
  whether --fused or single-ingest-sequential is the right default;
- config-4 streaming (640x480, 4 streams) with serialized vs
  double-buffered ingest (``StreamingForce.run_overlapped``).

Usage: python scripts/bench_ingest.py [out.json]
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')
from vistaf_tpu.utils.jaxcache import enable as _enable
_enable()

import numpy as np

REF = '/root/reference'
SCENE = 'FINAL_E_deformed'
REF_JPG = f'{REF}/Final_demos_images/FINAL_reference.jpg'
DEF_JPG = f'{REF}/Final_demos_images/{SCENE}.jpg'


def _median(xs):
    return float(np.median(np.asarray(xs)))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else 'BENCH_INGEST_r05.json'
    import cv2
    import jax
    import jax.numpy as jnp
    from vistaf_tpu.config import FTPConfig, TempConfig
    from vistaf_tpu.pipelines.force import ForcePipeline
    from vistaf_tpu.pipelines.multimodal import MultimodalPipeline
    from vistaf_tpu.runner import native

    res = {"scene": SCENE, "resolution": "3840x2160",
           "note": ("host->device numbers are measured over this machine's "
                    "dev tunnel; the breakdown (decode / upload / compute) "
                    "lets a production host substitute its PCIe cost")}

    # ---------------- decode ----------------
    reps = 8
    if native.native_available():
        t0 = time.perf_counter()
        for _ in range(reps):
            frame = native.decode_jpeg(DEF_JPG)
        res["decode_ms_native"] = (time.perf_counter() - t0) / reps * 1e3
        res["decode_backend"] = "native libjpeg"
    else:
        frame = None
        res["decode_backend"] = "cv2 (native .so not built)"
    t0 = time.perf_counter()
    for _ in range(reps):
        frame_cv = cv2.imread(DEF_JPG, cv2.IMREAD_COLOR)
    res["decode_ms_cv2"] = (time.perf_counter() - t0) / reps * 1e3
    if frame is None:
        frame = frame_cv
    ref_frame = cv2.imread(REF_JPG, cv2.IMREAD_COLOR)

    # ---------------- upload ----------------
    ups = []
    for _ in range(5):
        t0 = time.perf_counter()
        d = jax.device_put(frame)
        d.block_until_ready()
        ups.append(time.perf_counter() - t0)
    res["upload_ms_24MB"] = _median(ups) * 1e3
    res["link_MBps"] = frame.nbytes / 1e6 / _median(ups)

    # ---------------- camera -> force, serialized ----------------
    fpipe = ForcePipeline.from_artifacts(REF, ftp_cfg=FTPConfig().deploy())
    ref_dev = jax.device_put(ref_frame)

    import jax.numpy as jnp
    fwd = fpipe.ftp.forward_device

    def one_frame():
        t0 = time.perf_counter()
        fr = native.decode_jpeg(DEF_JPG) if native.native_available() \
            else cv2.imread(DEF_JPG, cv2.IMREAD_COLOR)
        t1 = time.perf_counter()
        dev = jax.device_put(fr)
        outd = fwd(ref_dev, dev)
        force = float(outd["height_map_mm_crop"][0, 0])  # scalar fetch sync
        t2 = time.perf_counter()
        return (t1 - t0) * 1e3, (t2 - t1) * 1e3

    one_frame()  # compile + warm
    rows = [one_frame() for _ in range(8)]
    res["camera_to_force_ms"] = {
        "reps": len(rows),
        "decode_ms": _median([r[0] for r in rows]),
        "upload_plus_compute_plus_fetch_ms": _median([r[1] for r in rows]),
        "total_ms": _median([r[0] + r[1] for r in rows]),
    }

    # ---------------- multimodal upload variants ----------------
    mm = MultimodalPipeline.from_artifacts(
        REF, ftp_cfg=FTPConfig().deploy(), temp_cfg=TempConfig().deploy())

    def timed(fn, n=5):
        fn()  # warm/compile
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return _median(ts) * 1e3

    ref_np = np.asarray(ref_frame)
    res["mm_per_frame_ms"] = {
        # numpy def frame into two jit calls -> two 24 MB uploads
        "sequential_numpy_2_uploads": timed(
            lambda: mm(ref_dev, np.asarray(frame))["force"]["force_N"]),
        # ingest once, both graphs share the device frame
        "sequential_ingest_1_upload": timed(
            lambda: mm(ref_dev, MultimodalPipeline.ingest(frame))
            ["force"]["force_N"]),
        "fused_1_upload_scalars": timed(
            lambda: mm.step_fused(ref_dev, np.asarray(frame),
                                  fetch="scalars")["force_N"]),
    }

    # ---------------- config-4 streaming incl. ingest (640x480) ----------
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.parallel.mesh import BatchedForce
    from vistaf_tpu.pipelines.streaming import StreamingForce
    from vistaf_tpu.utils.synthetic import scaled_ftp_config
    H, W, S = 480, 640, 4
    cfg_s = scaled_ftp_config(H, W).deploy()
    p2h = {"type": "hinge_saturating",
           "params": {"a": 2.0826494996246554, "b": 4.20441143052732,
                      "c": -1.767844217125454e-09}}
    force_model = {"type": "growth",
                   "params": {"a": 1.6197727931063521, "b": 9.756634595755994}}
    bf = BatchedForce(FTPPipeline(cfg_s, p2h), force_model)
    ref_s = cv2.resize(ref_frame, (W, H), interpolation=cv2.INTER_AREA)
    de_s = cv2.resize(frame, (W, H), interpolation=cv2.INTER_AREA)
    refs = np.stack([ref_s] * S)
    frames = np.stack([de_s] * S)
    sf = StreamingForce(bf, S)
    seq = [frames.copy() for _ in range(12)]

    sf.run_overlapped(refs, seq[:2])  # compile + warm
    t0 = time.perf_counter()
    outs = sf.run_overlapped(refs, seq)
    dt = time.perf_counter() - t0
    res["config4_with_ingest"] = {
        "reps_frames": len(seq),
        "overlapped_step_ms": dt / len(seq) * 1e3,
        "overlapped_stream_frames_per_sec": S * len(seq) / dt,
    }
    # serialized: upload + step + fetch every frame
    sf.reset()
    t0 = time.perf_counter()
    for fb in seq:
        out = sf(refs, fb)
        _ = float(out["total_force_N"])
    dt = time.perf_counter() - t0
    res["config4_with_ingest"]["serialized_step_ms"] = dt / len(seq) * 1e3
    res["config4_with_ingest"]["serialized_stream_frames_per_sec"] = \
        S * len(seq) / dt
    res["config4_with_ingest"]["batch_bytes_per_step"] = int(frames.nbytes)

    with open(out_path, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()

"""Benchmark: 640x480 frame->force throughput on one TPU chip vs the
reference CPU implementation at the same scale.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": x}

Baseline: the actual reference implementation (/root/reference, NumPy/OpenCV
+ pure-Python unwrap), run at the same 640x480 scale with identically scaled
constants; measured once and cached in bench_baseline.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from vistaf_tpu.utils.jaxcache import enable as _enable_jax_cache
_enable_jax_cache()

REFERENCE_ROOT = "/root/reference"
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
H, W = 480, 640


def wait_for_tpu(max_wait_s: float = 1500.0) -> None:
    """Block until the tunneled chip answers a trivial op.

    The axon pool can transiently return UNAVAILABLE (terminal restart,
    stale claim); a bench run that fails fast on that records nothing.
    Probe in a clean subprocess (a failed in-process backend init poisons
    jax's backend cache) and NEVER kill a probe mid-claim — a SIGKILLed
    claimant is exactly what wedges the pool (see the verify skill's
    claim-hygiene note).  A probe that exits on its own (success or an
    UNAVAILABLE error) may be relaunched; a probe still blocked in the
    claim at the deadline is left running as the patient claimant and the
    bench proceeds to wait on the backend itself.
    """
    import subprocess
    deadline = time.time() + max_wait_s
    probe = ("import jax, jax.numpy as jnp; "
             "assert jax.devices()[0].platform == 'tpu'; "
             "print(float(jax.jit(lambda x: x + 1.0)(jnp.float32(1.0))))")
    attempt = 0
    while True:
        attempt += 1
        proc = subprocess.Popen([sys.executable, "-c", probe],
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        while proc.poll() is None and time.time() < deadline:
            time.sleep(5.0)
        rc = proc.poll()
        if rc == 0:
            return
        if rc is None:
            print(f"bench: TPU probe {attempt} still claiming at the "
                  f"{max_wait_s:.0f}s deadline; leaving it running and "
                  "proceeding", file=sys.stderr, flush=True)
            return
        if time.time() >= deadline:
            print(f"bench: TPU unreachable after {attempt} probes "
                  f"({max_wait_s:.0f}s); proceeding (will fail loudly)",
                  file=sys.stderr, flush=True)
            return
        print(f"bench: TPU probe {attempt} exited rc={rc}; retrying in 60s",
              file=sys.stderr, flush=True)
        time.sleep(60.0)


def small_inputs():
    """640x480 frame pair: downscaled reference demo images if available,
    else a synthetic grating scene."""
    from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair
    cfg = scaled_ftp_config(H, W).deploy()
    ref_p = os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_reference.jpg")
    def_p = os.path.join(REFERENCE_ROOT, "Final_demos_images/FINAL_E_deformed.jpg")
    if os.path.exists(ref_p):
        import cv2
        ref = cv2.resize(cv2.imread(ref_p, cv2.IMREAD_COLOR), (W, H), interpolation=cv2.INTER_AREA)
        de = cv2.resize(cv2.imread(def_p, cv2.IMREAD_COLOR), (W, H), interpolation=cv2.INTER_AREA)
    else:
        ref, de = synthetic_pair(H, W, cfg)
    return cfg, ref, de


def measure_tpu(cfg, ref, de, iters=30, rounds=5):
    import jax
    import jax.numpy as jnp
    from vistaf_tpu.calib import scalar_models
    from vistaf_tpu.ftp.pipeline import FTPPipeline
    from vistaf_tpu.pipelines.force import depth_map_to_volume_cm3

    p2h = {"type": "hinge_saturating",
           "params": {"a": 2.0826494996246554, "b": 4.20441143052732,
                      "c": -1.767844217125454e-09}}
    force_model = {"type": "growth",
                   "params": {"a": 1.6197727931063521, "b": 9.756634595755994}}
    pipe = FTPPipeline(cfg, p2h)

    def fn(r, d):
        res = pipe._forward_impl(r, d)
        height = res["height_map_mm_crop"]
        roi = jnp.isfinite(height)
        mm_per_px = 2.0 / jnp.maximum(res["est_period_px"], 1e-9)
        v, a, dd = depth_map_to_volume_cm3(height, roi, mm_per_px, 0.01)
        f = scalar_models.predict_force_from_volume(force_model, v)
        return f, v, dd

    jfn = jax.jit(fn)
    r = jax.device_put(np.asarray(ref))
    d = jax.device_put(np.asarray(de))
    force = float(jfn(r, d)[0])  # compile + warm (real byte fetch)

    # block_until_ready can return before compute finishes on tunneled TPU
    # platforms, so all timing is fetch-based: enqueue N executions on the
    # in-order device queue, fetch real output bytes once, and subtract the
    # separately measured fetch round-trip.  (total - rtt) / N is the honest
    # per-execution device time == steady-state serving latency; its inverse
    # is the pipelined throughput.
    triv = jax.jit(lambda x: x + 1.0)
    _ = float(triv(jnp.float32(1.0)))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _ = float(triv(jnp.float32(1.0)))
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    per_exec = []
    for _round in range(rounds):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = jfn(r, d)
        _ = float(out[0])
        per_exec.append(max(time.perf_counter() - t0 - rtt, 1e-9) / iters)
    p50_s = float(np.percentile(per_exec, 50))
    fps = 1.0 / p50_s
    # run-to-run band for the artifact writers: rounds samples of
    # (iters-averaged) per-execution time; p10/p90 bound the noise floor so
    # sub-band deltas are machine-visibly noise (VERDICT r04 weak #4).
    measure_tpu.last_stats = {
        "reps": rounds, "iters_per_rep": iters,
        "p10_ms": round(float(np.percentile(per_exec, 10)) * 1000.0, 2),
        "p90_ms": round(float(np.percentile(per_exec, 90)) * 1000.0, 2),
    }
    return float(fps), p50_s * 1000.0, force


def measure_reference_cpu(ref, de, cfg):
    """Run the actual reference implementation at 640x480 (scaled constants)
    and time one end-to-end frame->force pass."""
    import types
    import cv2

    sk = types.ModuleType("skimage")
    skr = types.ModuleType("skimage.restoration")
    skr.unwrap_phase = lambda x: x
    sk.restoration = skr
    sys.modules.setdefault("skimage", sk)
    sys.modules.setdefault("skimage.restoration", skr)
    import matplotlib
    matplotlib.use("Agg", force=True)

    sys.path.insert(0, os.path.join(REFERENCE_ROOT, "Code"))
    import shape_ftp

    tmp = "/tmp/vistaf_bench"
    os.makedirs(tmp, exist_ok=True)
    ref_p = os.path.join(tmp, "ref.png")
    def_p = os.path.join(tmp, "def.png")
    cv2.imwrite(ref_p, ref)
    cv2.imwrite(def_p, de)

    # mirror the scaled config into the reference's module globals
    g = dict(
        OUTER_CIRCLE_P1=cfg.outer_circle_p1, OUTER_CIRCLE_P2=cfg.outer_circle_p2,
        OUTER_CIRCLE_P3=cfg.outer_circle_p3,
        FFT_PAD_PX=cfg.fft_pad_px, PRE_BLUR_SIGMA_PX=cfg.pre_blur_sigma_px,
        ILLUM_SIGMA_PX=cfg.illum_sigma_px, APOD_TAPER_PX=cfg.apod_taper_px,
        QUALITY_SMOOTH_SIGMA_PX=cfg.quality_smooth_sigma_px,
        VALID_CLOSE_KERNEL=cfg.valid_close_kernel,
        RELIABLE_EDGE_MARGIN_PX=cfg.reliable_edge_margin_px,
        DILATE_KERNEL_SIZE=cfg.dilate_kernel_size,
        BAD_DILATE_KSIZE=cfg.bad_dilate_ksize,
        RELIABLE_SMOOTH_SIGMA_PX=cfg.reliable_smooth_sigma_px,
        UNRELIABLE_SMOOTH_SIGMA_PX=cfg.unreliable_smooth_sigma_px,
        FRONTIER_ZERO_BAND_PX=cfg.frontier_zero_band_px,
        HOLE_NEIGHBORHOOD_PX=cfg.hole_neighborhood_px,
        INPAINT_RADIUS=cfg.inpaint_radius, BAD_INPAINT_RADIUS=cfg.bad_inpaint_radius,
        DC_EXCLUSION=cfg.dc_exclusion, ECC_GAUSS_FILT=cfg.ecc_gauss_filt,
        CALIBRATION_JSON=os.path.join(
            REFERENCE_ROOT, "Force/Phase_to_height/calibration_out/calibration_model.json"),
    )
    for k, v in g.items():
        setattr(shape_ftp, k, v)

    t0 = time.perf_counter()
    res = shape_ftp.main(
        reference_path=ref_p, deformed_path=def_p, output_dir=tmp,
        batch_mode=True, save_summary_figures=False, export_heightmaps=False,
        debug=False, return_results=True)
    # volume + force (force_sensor logic)
    hm = res["height_map_mm_crop"]
    roi = res["roi_eroded_crop"]
    est = res["estimated_grating_period_px"]
    mm_per_px = 2.0 / est
    Z = np.where(np.isfinite(hm), hm, 0.0)
    depth = np.clip(Z, 0, np.inf)
    depth[~roi] = 0.0
    contact = depth > 0.01
    v = float(depth[contact].sum() * mm_per_px ** 2 / 1000.0)
    f = 1.6197727931063521 * (np.exp(9.756634595755994 * v) - 1.0)
    elapsed = time.perf_counter() - t0
    return 1.0 / elapsed, float(f)


def main():
    wait_for_tpu()
    cfg, ref, de = small_inputs()
    fps, p50_ms, force = measure_tpu(cfg, ref, de)

    baseline_fps = None
    if os.path.exists(BASELINE_CACHE):
        try:
            baseline_fps = json.load(open(BASELINE_CACHE))["reference_cpu_fps_640x480"]
        except Exception:
            baseline_fps = None
    if baseline_fps is None and os.path.isdir(REFERENCE_ROOT):
        try:
            baseline_fps, ref_force = measure_reference_cpu(ref, de, cfg)
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"reference_cpu_fps_640x480": baseline_fps,
                           "reference_force_N": ref_force,
                           "note": "reference NumPy/OpenCV pipeline at 640x480, scaled constants"}, f, indent=2)
        except Exception as e:
            print(f"# baseline measurement failed: {e}", file=sys.stderr)
            baseline_fps = None

    vs = (fps / baseline_fps) if baseline_fps else None
    stats = getattr(measure_tpu, "last_stats", {})
    print(json.dumps({
        "metric": "frames/sec/chip at 640x480 frame->force; p50 latency "
                  f"{p50_ms:.2f} ms",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": None if vs is None else round(vs, 2),
        **stats,
    }))


if __name__ == "__main__":
    main()

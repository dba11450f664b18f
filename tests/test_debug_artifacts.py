"""Debug-artifact dump contract (SURVEY §5; VERDICT round-1 item 7):
same-filename DEBUG_* FTP figures + debug_log.txt and the temperature
debug PNG set."""
import os

import numpy as np

from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.utils.synthetic import scaled_ftp_config, synthetic_pair

FTP_DEBUG_SET = {
    "debug_log.txt",
    "DEBUG_fft_peaks_ref.png", "DEBUG_fft_peaks_def.png",
    "DEBUG_complex_amplitude_ref.png", "DEBUG_complex_amplitude_def.png",
    "DEBUG_phase_wrapped_ref.png", "DEBUG_phase_wrapped_def.png",
    "DEBUG_phase_unwrapped_ref.png", "DEBUG_phase_unwrapped_def.png",
    "DEBUG_ramp_phase_diff.png", "DEBUG_ramp_cross_phase_diff.png",
    "DEBUG_phase_diff_wrapped.png",
    "03_ref_def_crops_with_roi.png",
    "05_fft_debug_panels.png",
    "07_phase_and_height_FINAL_SMOOTH_ROI.png",
}

TEMP_DEBUG_SET = {"debug_seg_overlay.png", "debug_fft_mag.png", "debug_chroma_u8.png"}


def test_ftp_debug_filename_set(tmp_path):
    from vistaf_tpu.runner.debug_artifacts import write_ftp_debug

    H, W = 192, 256
    cfg = scaled_ftp_config(H, W).replace(
        percentile_method="hist", ecc_iters=20, unwrap_cg_iters=8, inpaint_iters=8)
    p2h = {"type": "hinge_saturating", "params": {"a": 2.08, "b": 4.2, "c": 0.0}}
    ref, de = synthetic_pair(H, W, cfg)
    pipe = FTPPipeline(cfg, p2h, debug_outputs=True)
    res = pipe(ref, de)
    write_ftp_debug(str(tmp_path), res, cfg, apo=pipe._apo,
                    log_lines=["[TEST] synthetic run"])
    files = set(os.listdir(tmp_path))
    assert FTP_DEBUG_SET <= files, FTP_DEBUG_SET - files
    log = open(tmp_path / "debug_log.txt").read()
    assert "grating period" in log and "[TEST]" in log


def test_temperature_debug_filename_set(tmp_path):
    import cv2
    from vistaf_tpu.runner.debug_artifacts import write_temperature_debug

    H, W = 120, 160
    rng = np.random.default_rng(0)
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    roi = np.zeros((H, W), bool)
    cv2.circle(roi.view(np.uint8), (80, 60), 40, 1, -1)
    dark = roi & (np.arange(W)[None, :] % 8 < 4)
    tres = {"roi_full": roi, "mask_dark": dark}
    write_temperature_debug(str(tmp_path), img, tres, bbox=None)
    files = set(os.listdir(tmp_path))
    assert TEMP_DEBUG_SET <= files, TEMP_DEBUG_SET - files


def test_temperature_debug_bbox_crop(tmp_path):
    """The crop bbox is (y0, y1, x0, x1) per ops.geometry.bbox_from_mask —
    the cropped debug PNGs must have exactly the ROI extent (a swapped-axes
    unpack would produce (x-span, y-span)-shaped crops here)."""
    import cv2
    from vistaf_tpu.ops.geometry import bbox_from_mask
    from vistaf_tpu.runner.debug_artifacts import write_temperature_debug

    H, W = 120, 160
    rng = np.random.default_rng(1)
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    roi = np.zeros((H, W), bool)
    cv2.circle(roi.view(np.uint8), (140, 50), 30, 1, -1)  # clipped at x=W
    dark = roi & (np.arange(W)[None, :] % 8 < 4)
    bbox = bbox_from_mask(roi, pad=5)
    y0, y1, x0, x1 = bbox
    assert (y1 - y0) != (x1 - x0)  # asymmetric crop so a swap is detectable
    write_temperature_debug(str(tmp_path), img, {"roi_full": roi, "mask_dark": dark},
                            bbox=bbox)
    for name in ("debug_seg_overlay.png", "debug_chroma_u8.png"):
        out = cv2.imread(str(tmp_path / name), cv2.IMREAD_UNCHANGED)
        assert out.shape[:2] == (y1 - y0, x1 - x0), (name, out.shape)


TEMP_RAW_SET = {
    "debug_wide_raw_dark_only_colormap.png",
    "debug_wide_raw_light_only_colormap.png",
    "debug_wide_raw_colormap.png",
    "debug_color_raw_colormap_20_33.png",
    "debug_color_raw_colormap_20_75.png",
    "debug_fused_source.png",
    "temperature_map_fused_colormap.png",
    "temperature_map_fused_colormap_overlay.png",
}


def test_temperature_raw_maps_filename_set(tmp_path):
    """The reference writes the raw-prediction/fused artifact set
    UNCONDITIONALLY (temperature_sensor.py:873-927); filename + crop-shape
    parity for write_temperature_raw_maps."""
    import cv2
    from vistaf_tpu.config import TempConfig
    from vistaf_tpu.ops.geometry import bbox_from_mask
    from vistaf_tpu.runner.debug_artifacts import write_temperature_raw_maps

    H, W = 120, 160
    rng = np.random.default_rng(2)
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    roi = np.zeros((H, W), bool)
    cv2.circle(roi.view(np.uint8), (80, 60), 40, 1, -1)
    dark = roi & (np.arange(W)[None, :] % 8 < 4)
    raw = np.where(roi, rng.random((H, W)).astype(np.float32) * 30 + 20, np.nan)
    tres = {
        "roi_full": roi, "roi_outer": roi,
        "mask_dark": dark, "mask_light": roi & ~dark,
        "wide_map_raw": raw, "color_map_raw": raw,
        "source_map": np.where(dark, 255, 0).astype(np.uint8),
        "temperature_map_fused": raw,
    }
    bbox = bbox_from_mask(roi, pad=4)
    write_temperature_raw_maps(str(tmp_path), img, tres, TempConfig(), bbox=bbox)
    files = set(os.listdir(tmp_path))
    assert TEMP_RAW_SET <= files, TEMP_RAW_SET - files
    src = cv2.imread(str(tmp_path / "debug_fused_source.png"), cv2.IMREAD_GRAYSCALE)
    assert src.shape == (bbox[1] - bbox[0], bbox[3] - bbox[2])

"""Stage-level parity diff: our jitted FTP pipeline vs the reference oracle
intermediates captured by make_reference_oracle.py."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import cv2

sys.path.insert(0, "/root/repo")
from vistaf_tpu.config import FTPConfig
from vistaf_tpu.ftp.pipeline import FTPPipeline
from vistaf_tpu.calib import artifacts

REF = "/root/reference"
SCENE = sys.argv[1] if len(sys.argv) > 1 else "FINAL_E_deformed"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ref_oracle_FINAL_E.npz"

o = np.load(ORACLE)
p2h, use_neg = artifacts.load_phase_to_height(
    f"{REF}/Force/Phase_to_height/calibration_out/calibration_model.json")
pipe = FTPPipeline(FTPConfig(), p2h, use_neg, debug_outputs=True)

ref = cv2.imread(f"{REF}/Final_demos_images/FINAL_reference.jpg", cv2.IMREAD_COLOR)
de = cv2.imread(f"{REF}/Final_demos_images/{SCENE}.jpg", cv2.IMREAD_COLOR)
out = pipe(ref, de)


def stat(name, ours, theirs, mask=None):
    ours = np.asarray(ours, np.float64)
    theirs = np.asarray(theirs, np.float64)
    if mask is None:
        mask = np.isfinite(ours) & np.isfinite(theirs)
    else:
        mask = mask & np.isfinite(ours) & np.isfinite(theirs)
    d = np.abs(ours[mask] - theirs[mask])
    scale = np.abs(theirs[mask]).mean() + 1e-12
    print(f"{name:28s} maxabs={d.max():10.4g}  mean={d.mean():10.4g}  rel={d.mean()/scale:8.3g}  n={mask.sum()}")


def mask_iou(name, a, b):
    a = np.asarray(a, bool); b = np.asarray(b, bool)
    inter = (a & b).sum(); union = (a | b).sum()
    print(f"{name:28s} IoU={inter/max(union,1):8.5f}  ours={a.sum()} ref={b.sum()}")


rel_ref = o["reliable"]
print("== alignment ==")
stat("def_gray_aligned", out["dbg_def_gray_aligned"], o["ecc_aligned"].astype(np.float64))
print("ecc_warp ref:\n", o["ecc_warp"], " cc:", float(o["ecc_cc"]))
print("== demod ==")
print("peak ref ours", out["dbg_peak_ref"], "theirs", o["demod_ref_peak_f"])
stat("amp_ref", out["dbg_amp_ref"], o["demod_ref_amp"])
stat("amp_def", out["dbg_amp_def"], o["demod_def_amp"])
print("== masks ==")
stat("quality", out["dbg_quality"], o["quality"])
mask_iou("reliable", out["reliable_crop"], rel_ref)
mask_iou("output_reliable", out["output_reliable_crop"], o["output_reliable"])
print("== phase ==")
stat("wrapped(ref rel)", out["phase_wrapped_crop"], o["wrapped"], rel_ref)
stat("unwrapped(rel)", out["dbg_unwrapped"], o["unwrapped"], rel_ref)
# phase after detrend: compare poly2 (background fit) output z - ours phase_zeroed
print("== final ==")
stat("height_mm", out["height_map_mm_crop"], o["height_mm"])
hm_o = np.asarray(out["height_map_mm_crop"]); hm_r = o["height_mm"]
roi = o["roi_eroded"]
print("sum depth ours", np.nansum(hm_o[roi]), "ref", np.nansum(hm_r[roi]))
print("est period ours", out["estimated_grating_period_px"], "ref", float(o["est_period_px"]))

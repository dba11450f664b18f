"""Run the reference FTP implementation on a demo pair and record stage
intermediates into a cache .npz for stage-level parity diffing.

This imports the reference code read-only from /root/reference (skimage is
stubbed out — it is only used for debug figures).  Nothing from the reference
is copied into the framework; this script exists purely to produce oracle
arrays for tests.
"""
import os
import sys
import types
import numpy as np

OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ref_oracle_FINAL_E.npz"
SCENE = sys.argv[1] if len(sys.argv) > 1 else "FINAL_E_deformed"
REF = "/root/reference"

# stub skimage (unused in batch mode)
sk = types.ModuleType("skimage")
skr = types.ModuleType("skimage.restoration")
skr.unwrap_phase = lambda x: x
sk.restoration = skr
sys.modules["skimage"] = sk
sys.modules["skimage.restoration"] = skr

import matplotlib
matplotlib.use("Agg", force=True)

sys.path.insert(0, os.path.join(REF, "Code"))
os.chdir(REF)
import shape_ftp  # noqa: E402

REC = {}

_orig_unwrap = shape_ftp.unwrap_quality_guided
def rec_unwrap(wrapped, mask, quality):
    REC["wrapped"] = wrapped.copy()
    REC["reliable"] = mask.copy()
    REC["quality"] = quality.copy()
    out = _orig_unwrap(wrapped, mask, quality)
    REC["unwrapped"] = out.copy()
    return out
shape_ftp.unwrap_quality_guided = rec_unwrap

_orig_ecc = shape_ftp.align_crop_ecc
def rec_ecc(ref_u8, mov_u8, **kw):
    REC["ecc_ref_gray"] = ref_u8.copy()
    REC["ecc_mov_gray"] = mov_u8.copy()
    aligned, warp, cc = _orig_ecc(ref_u8, mov_u8, **kw)
    REC["ecc_aligned"] = aligned.copy()
    REC["ecc_warp"] = warp.copy()
    REC["ecc_cc"] = np.float64(cc)
    return aligned, warp, cc
shape_ftp.align_crop_ecc = rec_ecc

_orig_shift = shape_ftp.estimate_global_shift
def rec_shift(a, b):
    shift, resp = _orig_shift(a, b)
    REC["global_shift"] = np.array(shift)
    return shift, resp
shape_ftp.estimate_global_shift = rec_shift

_orig_demod = shape_ftp.ftp_complex_demod
def rec_demod(gray, **kw):
    out = _orig_demod(gray, **kw)
    tag = kw.get("tag", "x")
    REC[f"demod_{tag}_complex"] = out[4].copy()
    REC[f"demod_{tag}_peak_f"] = np.array(out[6])
    REC[f"demod_{tag}_amp"] = out[7].copy()
    REC[f"demod_{tag}_input"] = gray.copy()
    return out
shape_ftp.ftp_complex_demod = rec_demod

_orig_poly = shape_ftp.robust_polyfit2d
_poly_calls = []
def rec_poly(z, mask, order=2, iters=6, c=4.685):
    coef, fit = _orig_poly(z, mask, order=order, iters=iters, c=c)
    _poly_calls.append((z.copy(), mask.copy(), order, coef.copy(), fit.copy()))
    return coef, fit
shape_ftp.robust_polyfit2d = rec_poly

res = shape_ftp.main(
    reference_path=f"{REF}/Final_demos_images/FINAL_reference.jpg",
    deformed_path=f"{REF}/Final_demos_images/{SCENE}.jpg",
    output_dir="/tmp/ref_ftp_run",
    batch_mode=True,
    save_summary_figures=False,
    export_heightmaps=False,
    debug=False,
    return_results=True,
)

for i, (z, m, order, coef, fit) in enumerate(_poly_calls):
    REC[f"poly{i}_z"] = z
    REC[f"poly{i}_mask"] = m
    REC[f"poly{i}_order"] = np.int32(order)
    REC[f"poly{i}_coef"] = coef
    REC[f"poly{i}_fit"] = fit

REC["height_mm"] = res["height_map_mm_crop"]
REC["roi_eroded"] = res["roi_eroded_crop"]
REC["output_reliable"] = res["output_reliable_crop"]
REC["est_period_px"] = np.float64(res["estimated_grating_period_px"])

np.savez_compressed(OUT, **REC)
print("saved", OUT, "keys:", sorted(REC.keys()))

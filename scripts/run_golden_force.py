"""Manual golden check: FINAL_reference + scene -> force, vs Demos_report."""
import os, sys, time, json
os.environ['JAX_PLATFORMS'] = os.environ.get('VISTAF_PLATFORM', 'cpu')
import jax
jax.config.update("jax_platforms", os.environ.get('VISTAF_PLATFORM', 'cpu'))
import numpy as np, cv2

sys.path.insert(0, '/root/repo')
from vistaf_tpu.config import FTPConfig, ForceConfig
from vistaf_tpu.pipelines.force import ForcePipeline

REF = '/root/reference'
scene = sys.argv[1] if len(sys.argv) > 1 else 'FINAL_E_deformed'

pipe = ForcePipeline.from_artifacts(REF)
ref = cv2.imread(f'{REF}/Final_demos_images/FINAL_reference.jpg', cv2.IMREAD_COLOR)
def_ = cv2.imread(f'{REF}/Final_demos_images/{scene}.jpg', cv2.IMREAD_COLOR)
t0 = time.time()
out = pipe(ref, def_, roi_from_finite=True)
print(f"elapsed: {time.time()-t0:.1f}s")
for k in ['force_N','volume_cm3','contact_area_mm2','max_depth_mm','mm_per_px','estimated_grating_period_px']:
    print(f"  {k}: {out[k]:.6g}")

gold_path = f'{REF}/Multimodal_Sensor/Demos_report/{scene}/force_sensing/result.json'
if os.path.exists(gold_path):
    g = json.load(open(gold_path))
    print("golden:")
    for k in ['force_N','volume_cm3','contact_area_mm2','max_depth_mm','mm_per_px','estimated_grating_period_px']:
        print(f"  {k}: {g[k]:.6g}")

"""Golden check: temperature pipeline on a demo frame vs reference outputs."""
import os, sys, time, json
os.environ['JAX_PLATFORMS'] = os.environ.get('VISTAF_PLATFORM', 'cpu')
import jax
jax.config.update("jax_platforms", os.environ.get('VISTAF_PLATFORM', 'cpu'))
import numpy as np, cv2
sys.path.insert(0, '/root/repo')
from vistaf_tpu.temperature.inference import TemperaturePipeline

REF = '/root/reference'
scene = sys.argv[1] if len(sys.argv) > 1 else 'FINAL_TEMP_DEMO'
pipe = TemperaturePipeline.from_artifacts(REF)
img = cv2.imread(f'{REF}/Final_demos_images/{scene}.jpg', cv2.IMREAD_COLOR)
t0=time.time(); out = pipe(img); print(f"elapsed {time.time()-t0:.1f}s")
print(f"T mean={out['t_mean']:.3f} min={out['t_min']:.3f} max={out['t_max']:.3f} std={out['t_std']:.3f} n={out['valid_pixels']}")
# goldens live in multimodal summaries keyed by deformed scene name
gold = None
p = f'{REF}/Multimodal_Sensor/Demos_report/{scene}/combined_outputs/multimodal_summary.json'
if os.path.exists(p):
    g = json.load(open(p))['sensor_readings']['temperature']
    print(f"golden: mean={g['mean_C']:.3f} min={g['min_C']:.3f} max={g['max_C']:.3f} std={g['std_C']:.3f} n={g['valid_pixels']}")

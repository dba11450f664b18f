"""vistaf_tpu — TPU-native rebuild of the VISTAF RoboSkin multimodal tactile sensor.

A JAX/XLA/Pallas framework providing the full capability surface of the
reference (single-RGB-camera soft tactile skin: force, shape/heightmap and
temperature estimation via Fourier Transform Profilometry and thermochromic
liquid-crystal color regression), re-designed TPU-first:

- every per-frame stage is a pure, statically-shaped function over arrays,
  composed into one jitted graph per pipeline (``vistaf_tpu.pipelines``);
- hot primitives (FFT demodulation, masked filtering, phase unwrapping,
  per-pixel polynomial regression) live in ``vistaf_tpu.ops`` /
  ``vistaf_tpu.pallas``;
- calibration artifacts load into plain weight pytrees
  (``vistaf_tpu.calib``) — no sklearn at inference time;
- multi-camera / batched scaling goes through ``jax.sharding`` meshes
  (``vistaf_tpu.parallel``), not host loops.

Layer map mirrors SURVEY.md §7.1.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("JAX_PLATFORMS"):
    # Honor JAX_PLATFORMS even when a PJRT plugin pre-selected a platform
    # at interpreter start (e.g. a sitecustomize-registered TPU plugin
    # parses absl flags before user code runs, after which the env var
    # alone no longer wins).  Makes `JAX_PLATFORMS=cpu python -m
    # vistaf_tpu.runner.cli ...` work as documented anywhere.
    import jax as _jax

    try:
        # private, so probe defensively: on a jax that renames it, skip
        # rather than break `import vistaf_tpu`
        _backends = getattr(_jax._src.xla_bridge, "_backends", None)
        if _backends is not None and not _backends:   # only before init
            _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from vistaf_tpu import config  # noqa: F401

"""Temperature sensing (L4): TLC stripe segmentation + per-pixel regression."""

from vistaf_tpu.temperature.segmentation import segment_stripes  # noqa: F401
from vistaf_tpu.temperature.inference import TemperaturePipeline  # noqa: F401

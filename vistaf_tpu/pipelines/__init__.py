"""End-user pipelines (L4/L5): force, temperature, multimodal."""

from vistaf_tpu.pipelines.force import ForcePipeline, depth_map_to_volume_cm3  # noqa: F401

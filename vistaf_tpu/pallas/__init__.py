"""Hand-fused Pallas TPU kernels for the hottest per-pixel passes."""

from vistaf_tpu.pallas.temp_kernel import fused_temperature_maps  # noqa: F401

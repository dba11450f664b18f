"""Calibration layer: scalar model zoo, artifact schemas, temperature model
weights (SURVEY.md §7.1 item 3)."""

from vistaf_tpu.calib import scalar_models  # noqa: F401
from vistaf_tpu.calib import artifacts  # noqa: F401

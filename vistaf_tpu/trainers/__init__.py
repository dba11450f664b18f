"""Offline calibration trainers (L3): produce the model artifacts consumed
by the inference pipelines, with the reference's JSON/CSV schemas."""

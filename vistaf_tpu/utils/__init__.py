"""Utilities: synthetic scenes, scaled configs, michelson contrast, logging."""

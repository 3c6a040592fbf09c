"""Utilities: logging, experiment dirs."""

from .logging import create_logger, make_experiment_dir

__all__ = ["create_logger", "make_experiment_dir"]

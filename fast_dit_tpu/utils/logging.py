"""Logging + experiment-dir utilities.

Parity with the reference's logger (`/root/reference/train.py:54-73`):
rank-0-only real logger with ANSI-green timestamps, dual stream+file handlers
writing `log.txt`, NullHandler elsewhere; auto-incrementing experiment dirs
`{index:03d}-{model-name}` (train.py:136-140). "Rank 0" is
`jax.process_index() == 0`.
"""

from __future__ import annotations

import logging
import os
from glob import glob

__all__ = ["create_logger", "make_experiment_dir", "find_latest_experiment_dir"]


def create_logger(logging_dir: str | None, *, is_main: bool = True) -> logging.Logger:
    """Colored-timestamp logger on the main process, silent elsewhere
    (reference train.py:54-73)."""
    logger = logging.getLogger(__name__)
    logger.handlers.clear()
    if is_main:
        logger.setLevel(logging.INFO)
        fmt = logging.Formatter(
            "[\033[34m%(asctime)s\033[0m] %(message)s", datefmt="%Y-%m-%d %H:%M:%S")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if logging_dir is not None:
            fh = logging.FileHandler(os.path.join(logging_dir, "log.txt"))
            fh.setFormatter(logging.Formatter(
                "[%(asctime)s] %(message)s", datefmt="%Y-%m-%d %H:%M:%S"))
            logger.addHandler(fh)
    else:
        logger.addHandler(logging.NullHandler())
    logger.propagate = False
    return logger


def make_experiment_dir(results_dir: str, model_name: str) -> str:
    """`results/NNN-DiT-XL-2/` with auto-incremented NNN
    (reference train.py:136-140)."""
    os.makedirs(results_dir, exist_ok=True)
    existing = glob(f"{results_dir}/*")
    index = len(existing)
    safe = model_name.replace("/", "-")
    exp_dir = f"{results_dir}/{index:03d}-{safe}"
    os.makedirs(exp_dir, exist_ok=True)
    os.makedirs(os.path.join(exp_dir, "checkpoints"), exist_ok=True)
    return exp_dir


def find_latest_experiment_dir(results_dir: str, model_name: str) -> str | None:
    """Highest-indexed existing `NNN-{model}` dir, for `--resume` — the
    auto-increment in `make_experiment_dir` would otherwise start every
    invocation in a fresh empty dir and never see old checkpoints."""
    safe = model_name.replace("/", "-")
    candidates = sorted(glob(f"{results_dir}/[0-9][0-9][0-9]-{safe}"))
    return candidates[-1] if candidates else None

"""Platform helpers for the CLIs.

- `maybe_force_cpu()`: honor FDT_FORCE_CPU=1 — needed because this
  environment's sitecustomize pre-imports jax with a remote-TPU backend,
  which env vars alone cannot override (see tests/conftest.py).
- `maybe_initialize_distributed()`: multi-host bring-up. The reference used
  `torchrun` + `dist.init_process_group("nccl")`
  (train_baseline.py:117-124); the JAX equivalent is
  `jax.distributed.initialize()`, which reads the coordinator/process-count
  from the TPU environment or explicit env vars.
"""

from __future__ import annotations

import os

import jax

__all__ = ["maybe_force_cpu", "maybe_initialize_distributed"]


def maybe_force_cpu():
    if os.environ.get("FDT_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")


def maybe_initialize_distributed():
    """Initialize multi-host JAX when a coordinator is configured.

    No-op for single-process runs. Set JAX_COORDINATOR_ADDRESS (+
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or rely on TPU metadata) to enable.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

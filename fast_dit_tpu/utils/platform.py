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

__all__ = ["maybe_force_cpu", "maybe_initialize_distributed",
           "broadcast_string", "maybe_enable_compilation_cache"]


def maybe_force_cpu():
    if os.environ.get("FDT_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")


def maybe_enable_compilation_cache():
    """Persist XLA compilations across processes.

    First compiles of the big programs here (XL/2 train step, 250-step
    sampling chains) take minutes; the persistent cache makes every rerun of
    the same program near-instant. Opt-out with FDT_COMPILATION_CACHE=0, or
    point FDT_COMPILATION_CACHE at a directory (default
    ~/.cache/fast_dit_tpu/xla). The reference has no equivalent (torch
    eager re-traces nothing, but also fuses nothing).
    """
    setting = os.environ.get("FDT_COMPILATION_CACHE", "")
    if setting == "0":
        return
    path = setting or os.path.join(
        os.path.expanduser("~"), ".cache", "fast_dit_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything, including sub-second compiles (many small CPU
        # test programs would otherwise churn the dir — those run with the
        # cache disabled via conftest's platform override being CPU-only)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # unknown config names on old jax: cache is optional
        pass


def maybe_initialize_distributed():
    """Initialize multi-host JAX when a coordinator is configured.

    No-op for single-process runs. Set JAX_COORDINATOR_ADDRESS (+
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or rely on TPU metadata) to enable.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    if not addr:
        return
    if os.environ.get("JAX_NUM_PROCESSES"):
        # explicit local bring-up (e.g. the 2-process CPU test): JAX's
        # auto-detection only covers managed clusters (TPU/SLURM/k8s)
        if "JAX_PROCESS_ID" not in os.environ:
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not — "
                "explicit multi-process bring-up needs both (plus "
                "JAX_COORDINATOR_ADDRESS)")
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()


def broadcast_string(s: str | None, *, max_bytes: int = 4096) -> str:
    """Share a process-0 string (e.g. an experiment dir) with every host.

    Multi-host trainers need one common checkpoint path, but
    `make_experiment_dir` races if every process lists the results dir
    itself. Encode on rank 0, broadcast as a fixed-size uint8 array over the
    mesh, decode everywhere. No-op for single-process runs.
    """
    if jax.process_count() == 1:
        return s or ""
    import numpy as np
    from jax.experimental import multihost_utils

    data = (s or "").encode()
    assert len(data) <= max_bytes, f"string too long to broadcast: {len(data)}"
    buf = np.zeros(max_bytes, np.uint8)
    buf[: len(data)] = np.frombuffer(data, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return out.tobytes().rstrip(b"\x00").decode()

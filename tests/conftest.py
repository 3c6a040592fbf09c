"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference could never test its NCCL paths without GPUs; here multi-chip
sharding tests run anywhere via XLA's host-platform device override
(SURVEY.md §4 item d).

Note: the ambient environment may pre-import jax with a remote-TPU (axon)
backend via sitecustomize, overriding JAX_PLATFORMS env vars — so we force
the platform through jax.config AFTER import, before any backend is
initialized. Every test dispatch must stay local.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on local CPU devices"
assert len(jax.devices()) == 8, "expected 8 virtual CPU devices for mesh tests"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The full suite compiles ~hundreds of XLA:CPU programs in one process; the
# LLVM JIT has segfaulted inside backend_compile_and_load late in the run
# (observed twice at ~92%, 2026-08-21, e.g. under test_tome_mlp_mode —
# the same test is clean in a short process). Two mitigations:
#  1. a persistent on-disk compilation cache (compiles become loads on
#     warm runs — also makes reruns much faster);
#  2. drop live compiled executables between test modules, bounding the
#     JIT code resident in the process. Cross-module recompiles are cheap
#     relative to a segfaulted 35-minute run.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join("/tmp", "fdt_jax_test_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_code_per_module():
    yield
    jax.clear_caches()

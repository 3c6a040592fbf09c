"""Two-process jax.distributed tests (local coordinator, CPU).

The reference's only multi-process evidence is its 2-GPU DDP runs
(`/root/reference/performance/2A100/*.out`). Here the equivalent paths —
`jax.distributed.initialize` bring-up, the experiment-dir broadcast, global
collectives, `feature_batches` process striding, and sample_ddp's strided
filenames + barrier + npz pack — run for real under process_count == 2.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn_pair(argv, timeout=600):
    """Run `argv` twice with a shared local coordinator; return both results."""
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(
            os.environ,
            FDT_FORCE_CPU="1",
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(rank),
        )
        # one CPU device per process (the parent test env forces 8)
        env["XLA_FLAGS"] = " ".join(
            f for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f)
        procs.append(subprocess.Popen(
            argv, env=env, cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    results = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        results.append((p.returncode, out, err))
    return results


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    """maybe_initialize_distributed + broadcast_string + cross-host psum +
    feature_batches striding, all under process_count == 2."""
    feat = tmp_path / "features"
    lab = tmp_path / "labels"
    feat.mkdir()
    lab.mkdir()
    for i in range(8):
        np.save(feat / f"{i}.npy", np.random.rand(4, 4, 4).astype(np.float32))
        np.save(lab / f"{i}.npy", np.int64(i))  # label encodes global index

    results = _spawn_pair(
        [sys.executable, os.path.join(REPO, "tests/_multihost_worker.py"),
         str(tmp_path)])
    for rank, (rc, out, err) in enumerate(results):
        assert rc == 0, f"rank {rank} failed:\n{err[-3000:]}"
        assert f"rank {rank}: OK" in out


@pytest.mark.slow
def test_sample_ddp_two_process(tmp_path):
    """The FID harness under 2 processes: per-rank seeds, rank-strided PNG
    indices, cross-host barrier, rank-0 npz pack (reference sample_ddp.py
    :54-60,95-146 semantics)."""
    results = _spawn_pair(
        [sys.executable, os.path.join(REPO, "sample_ddp.py"),
         "--model", "DiT-S/8", "--ckpt", "random",
         "--per-proc-batch-size", "2", "--num-fid-samples", "8",
         "--num-sampling-steps", "2", "--cfg-scale", "1.0",
         "--sample-dir", str(tmp_path)])
    for rank, (rc, out, err) in enumerate(results):
        assert rc == 0, f"rank {rank} failed:\n{err[-3000:]}"

    subdirs = [d for d in os.listdir(tmp_path) if not d.endswith(".npz")]
    assert len(subdirs) == 1
    pngs = sorted(os.listdir(tmp_path / subdirs[0]))
    assert pngs == [f"{i:06d}.png" for i in range(8)]  # strided, no gaps
    npz = [f for f in os.listdir(tmp_path) if f.endswith(".npz")]
    arr = np.load(str(tmp_path / npz[0]))["arr_0"]
    assert arr.shape == (8, 32, 32, 3) and arr.dtype == np.uint8

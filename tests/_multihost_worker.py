"""Worker for the 2-process jax.distributed test (see test_multihost.py).

Run as: python _multihost_worker.py <data_dir>
with FDT_FORCE_CPU=1, JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID in the environment. Exercises the multi-host code paths that
single-process tests can never reach: `maybe_initialize_distributed`,
`broadcast_string`, cross-host collectives, and the `feature_batches`
process striding (the reference's closest analog is its 2-GPU DDP runs,
`/root/reference/performance/2A100/`).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fast_dit_tpu.utils.platform import (
    broadcast_string, maybe_force_cpu, maybe_initialize_distributed)

maybe_force_cpu()
maybe_initialize_distributed()

import jax  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

rank = jax.process_index()
world = jax.process_count()
assert world == 2, f"expected 2 processes, got {world}"
assert len(jax.devices()) == 2, jax.devices()  # one CPU device per host

# 1. rank-0 string reaches every host (the experiment-dir broadcast)
got = broadcast_string("results/007-DiT-XL-2" if rank == 0 else None)
assert got == "results/007-DiT-XL-2", (rank, got)

# 2. a cross-host global computation: global-mesh psum of per-host values
from fast_dit_tpu.parallel import create_mesh  # noqa: E402

mesh = create_mesh(data=2, model=1)
arr = jax.make_array_from_process_local_data(
    jax.NamedSharding(mesh, jax.sharding.PartitionSpec("data")),
    np.full((1,), float(rank + 1), np.float32), (2,))
total = jax.jit(lambda x: x.sum(),
                out_shardings=jax.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))(arr)
# replicated global output: every host reads its local replica
assert float(np.asarray(total.addressable_shards[0].data)) == 3.0

# 3. feature_batches process striding: shards are disjoint and complete
from fast_dit_tpu.data import FeatureDataset, feature_batches  # noqa: E402

data_dir = sys.argv[1]
ds = FeatureDataset(os.path.join(data_dir, "features"),
                    os.path.join(data_dir, "labels"))
seen = []
for batch in feature_batches(ds, batch_size=4, shuffle=True, seed=7,
                             num_epochs=1, process_index=rank,
                             process_count=world):
    assert batch["x"].shape == (2, 4, 4, 4)  # local = global/world
    seen.extend(int(l) for l in batch["y"])  # labels encode global index

all_seen = multihost_utils.process_allgather(
    np.asarray(sorted(seen), np.int32))
union = sorted(int(x) for x in np.asarray(all_seen).ravel())
assert union == list(range(len(ds))), union  # disjoint + complete

# 4. host barrier (the sample_ddp sync point)
multihost_utils.sync_global_devices("done")
print(f"rank {rank}: OK")

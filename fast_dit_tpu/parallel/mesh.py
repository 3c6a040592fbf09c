"""Device mesh and sharding rules (GSPMD in place of DDP/NCCL).

The reference's entire distributed story is data parallelism over NCCL
(`/root/reference/train_options/train_baseline.py:117-124`, SURVEY.md §2.3):
torchrun processes + DDP gradient all-reduce + DistributedSampler. Here one
`jax.sharding.Mesh` with ('data', 'model') axes replaces all of it:

- dp    — batch sharded over 'data', params replicated; XLA emits the
          gradient all-reduce (what DDP did) automatically from the loss mean.
- fsdp  — params additionally sharded over 'data' on their largest axis
          (ZeRO-3-style; all-gathers inserted by XLA at use sites).
- tp    — DiT block weights sharded over 'model' along head / mlp-hidden
          axes (Megatron-style column/row parallel pairs, which XLA pairs
          into a single all-reduce per attention/MLP).

These compose; the reference has no TP/FSDP at all, so anything beyond dp is
headroom, not parity (SURVEY.md §2.3 "NOT present").
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "create_mesh",
    "create_expert_mesh",
    "dit_param_spec",
    "param_shardings",
    "batch_sharding",
    "replicated_sharding",
    "shard_params",
]


def create_expert_mesh(expert: int, data: Optional[int] = None,
                       devices=None) -> Mesh:
    """Mesh over ('data', 'expert') for expert-parallel MoE training
    (models/moe.py): expert FFN weights shard their leading expert axis
    over 'expert' (see _EP_PARAM below) and GSPMD turns the dispatch/
    combine einsums into the all-to-all. 'expert' innermost so the
    token exchange rides the fastest ICI links."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None:
        assert n % expert == 0, f"{n} devices not divisible by expert={expert}"
        data = n // expert
    if data * expert != n:
        raise ValueError(
            f"mesh data={data} x expert={expert} uses {data * expert} of "
            f"{n} devices; slice the device list explicitly")
    arr = np.array(devices).reshape(data, expert)
    return Mesh(arr, ("data", "expert"))


def create_mesh(data: Optional[int] = None, model: int = 1, devices=None) -> Mesh:
    """Mesh over ('data', 'model'). `data` defaults to n_devices / model.

    Axis order puts 'model' innermost so tensor-parallel collectives ride the
    fastest ICI links on real slices.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    if data * model != n:
        # silently dropping devices is a multi-chip footgun — make the caller
        # slice the device list explicitly if a smaller mesh is intended
        raise ValueError(
            f"mesh data={data} x model={model} uses {data * model} of {n} "
            f"devices; pass devices=jax.devices()[:{data * model}] to use a "
            "subset explicitly")
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


# (regex on the flax param path, PartitionSpec) — first match wins.
# Shapes: qkv kernel (L, D, 3, H, hd); proj kernel (L, H, hd, D);
# fc1 (L, D, 4D); fc2 (L, 4D, D). Column-parallel shards the output axis,
# row-parallel the input axis, so each attention/MLP needs one all-reduce.
# Expert-parallel (MoE, models/moe.py) params: wi (L, E, D, H),
# bi (L, E, H), wo (L, E, H, D), bo (L, E, D) — shard the EXPERT axis
# (axis 1, after the scan layer axis) over the mesh's 'expert' axis when
# one exists, else over 'model' when tp is on. The router stays
# replicated (it is tiny and every token needs every expert's logit).
_EP_PARAM = re.compile(r"blocks/block/mlp/(wi|bi|wo|bo)$")

_TP_RULES = [
    (r"blocks/block/attn/qkv/kernel", P(None, None, None, "model", None)),
    (r"blocks/block/attn/qkv/bias", P(None, None, "model", None)),
    (r"blocks/block/attn/proj/kernel", P(None, "model", None, None)),
    (r"blocks/block/mlp/fc1/kernel", P(None, None, "model")),
    (r"blocks/block/mlp/fc1/bias", P(None, "model")),
    (r"blocks/block/mlp/fc2/kernel", P(None, "model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def dit_param_spec(path_str: str, shape, *, tp: bool, fsdp: bool, mesh: Mesh) -> P:
    """PartitionSpec for one DiT parameter under the requested modes."""
    spec = [None] * len(shape)
    ep_axis = ("expert" if mesh.shape.get("expert", 1) > 1
               else "model" if tp and mesh.shape.get("model", 1) > 1
               else None)
    if ep_axis and _EP_PARAM.search(path_str):
        spec[1] = ep_axis
    if tp and mesh.shape.get("model", 1) > 1:
        for pattern, rule in _TP_RULES:
            if re.search(pattern, path_str):
                spec = list(rule) + [None] * (len(shape) - len(rule))
                break
    if fsdp and mesh.shape.get("data", 1) > 1:
        n = mesh.shape["data"]
        # shard the largest free axis divisible by the data-axis size
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % n == 0 and shape[i] >= n:
                spec[i] = "data"
                break
    return P(*spec)


def param_shardings(params, mesh: Mesh, *, tp: bool = False, fsdp: bool = False):
    """NamedSharding tree matching `params` (use as jit in/out_shardings)."""
    flat = jax.tree_util.tree_flatten_with_path(params)
    def one(path, leaf):
        spec = dit_param_spec(_path_str(path), leaf.shape, tp=tp, fsdp=fsdp, mesh=mesh)
        return NamedSharding(mesh, spec)
    leaves = [one(p, l) for p, l in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def batch_sharding(mesh: Mesh, ndim: int = None) -> NamedSharding:
    """Shard the leading (batch) dimension over 'data'."""
    if ndim is None:
        return NamedSharding(mesh, P("data"))
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh, *, tp: bool = False, fsdp: bool = False):
    """Place a host param tree onto the mesh with the DiT sharding rules."""
    shardings = param_shardings(params, mesh, tp=tp, fsdp=fsdp)
    return jax.device_put(params, shardings)

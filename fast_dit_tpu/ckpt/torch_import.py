"""PyTorch `.pt` checkpoint <-> flax parameter-tree conversion.

Honors the reference checkpoint contract: pretrained `DiT-XL-2-*.pt` files
are flat torch state_dicts with timm-style names (fused `blocks.N.attn.qkv`,
conv `x_embedder.proj`), and trainer checkpoints wrap them as
`{"model", "ema", "opt", "args"}` with EMA preferred on load
(`/root/reference/download.py:18-29`, `/root/reference/train.py:229-239`).

Mapping rules:
- torch Linear weight (out, in)     -> flax Dense kernel (in, out): transpose.
- torch conv patch-embed (D,C,p,p)  -> our Dense over (C*p*p)-flattened
  patches: reshape + transpose (bit-identical because stride == kernel).
- per-block `blocks.{i}.*`          -> stacked (depth, ...) arrays for the
  nn.scan'd block stack.
- `pos_embed` is skipped: it is the deterministic frozen sin-cos table and is
  recomputed (reference models_original.py:191-193).
- fused qkv keeps torch's row order [q;k;v] x (heads, head_dim): a plain
  transpose matches our (3, H, hd) column split.
"""

from __future__ import annotations

import re
from typing import Dict

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "state_dict_to_flax",
    "flax_to_state_dict",
    "import_dit_checkpoint",
]


def load_torch_checkpoint(path: str, prefer_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a torch .pt file to a flat {name: numpy} state dict.

    Train-loop checkpoints ({"model","ema","opt","args"}) resolve to the
    "ema" sub-dict when present (reference download.py:26-29), else "model".
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ("ema" in ckpt or "model" in ckpt):
        key = "ema" if (prefer_ema and "ema" in ckpt) else "model"
        ckpt = ckpt[key]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()}


_BLOCK_RE = re.compile(r"^blocks\.(\d+)\.(.+)$")


def _t(arr, heads):  # torch linear weight -> flax dense kernel
    return arr.T


def _id(arr, heads):
    return arr


def _qkv_w(arr, heads):
    # (3D, D) rows ordered (3, H, hd) -> kernel (D, 3, H, hd)
    three_d, d = arr.shape
    return arr.T.reshape(d, 3, heads, three_d // 3 // heads)


def _qkv_b(arr, heads):
    return arr.reshape(3, heads, -1)


def _proj_w(arr, heads):
    # (D_out, D_in) with D_in = H*hd -> kernel (H, hd, D_out)
    d_out, d_in = arr.shape
    return arr.T.reshape(heads, d_in // heads, d_out)


def _inv_qkv_w(arr, heads):
    d = arr.shape[0]
    return arr.reshape(d, -1).T


def _inv_qkv_b(arr, heads):
    return arr.reshape(-1)


def _inv_proj_w(arr, heads):
    h, hd, d_out = arr.shape
    return arr.reshape(h * hd, d_out).T


def _inv_t(arr, heads):
    return arr.T


# torch name suffix -> (flax path inside the block, import fn, export fn)
_BLOCK_MAP = {
    "adaLN_modulation.1.weight": ("adaLN_modulation/kernel", _t, _inv_t),
    "adaLN_modulation.1.bias": ("adaLN_modulation/bias", _id, _id),
    "attn.qkv.weight": ("attn/qkv/kernel", _qkv_w, _inv_qkv_w),
    "attn.qkv.bias": ("attn/qkv/bias", _qkv_b, _inv_qkv_b),
    "attn.proj.weight": ("attn/proj/kernel", _proj_w, _inv_proj_w),
    "attn.proj.bias": ("attn/proj/bias", _id, _id),
    "mlp.fc1.weight": ("mlp/fc1/kernel", _t, _inv_t),
    "mlp.fc1.bias": ("mlp/fc1/bias", _id, _id),
    "mlp.fc2.weight": ("mlp/fc2/kernel", _t, _inv_t),
    "mlp.fc2.bias": ("mlp/fc2/bias", _id, _id),
}

_TOP_MAP = {
    "x_embedder.proj.bias": ("x_embedder/proj/bias", False),
    "t_embedder.mlp.0.weight": ("t_embedder/fc1/kernel", True),
    "t_embedder.mlp.0.bias": ("t_embedder/fc1/bias", False),
    "t_embedder.mlp.2.weight": ("t_embedder/fc2/kernel", True),
    "t_embedder.mlp.2.bias": ("t_embedder/fc2/bias", False),
    "y_embedder.embedding_table.weight": ("y_embedder/embedding_table/embedding", False),
    "final_layer.adaLN_modulation.1.weight": ("final_layer/adaLN_modulation/kernel", True),
    "final_layer.adaLN_modulation.1.bias": ("final_layer/adaLN_modulation/bias", False),
    "final_layer.linear.weight": ("final_layer/linear/kernel", True),
    "final_layer.linear.bias": ("final_layer/linear/bias", False),
}


def _set_path(tree: dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def state_dict_to_flax(sd: Dict[str, np.ndarray], depth: int, num_heads: int) -> dict:
    """Flat torch state dict -> {"params": flax tree} with stacked blocks."""
    tree: dict = {}
    blocks: Dict[str, list] = {}
    for name, arr in sd.items():
        arr = np.asarray(arr)
        if name == "pos_embed":
            continue  # frozen sin-cos table, recomputed
        m = _BLOCK_RE.match(name)
        if m is not None:
            idx, suffix = int(m.group(1)), m.group(2)
            if suffix not in _BLOCK_MAP:
                raise KeyError(f"unknown block param: {name}")
            fpath, imp, _ = _BLOCK_MAP[suffix]
            blocks.setdefault(fpath, [None] * depth)
            blocks[fpath][idx] = imp(arr, num_heads)
        elif name == "x_embedder.proj.weight":
            # (D, C, p, p) conv -> (C*p*p, D) dense kernel
            d = arr.shape[0]
            _set_path(tree, "x_embedder/proj/kernel", arr.reshape(d, -1).T)
        elif name in _TOP_MAP:
            fpath, transpose = _TOP_MAP[name]
            _set_path(tree, fpath, arr.T if transpose else arr)
        else:
            raise KeyError(f"unknown param: {name}")

    for fpath, slices in blocks.items():
        missing = [i for i, s in enumerate(slices) if s is None]
        if missing:
            raise ValueError(f"blocks missing layers {missing} for {fpath}")
        _set_path(tree, f"blocks/block/{fpath}", np.stack(slices, axis=0))
    return {"params": tree}


def flax_to_state_dict(params: dict, patch_size: int, in_channels: int = 4,
                       input_size: int = None) -> Dict[str, np.ndarray]:
    """Inverse of `state_dict_to_flax`: export to reference-compatible names
    (so our checkpoints load into the reference's torch code). Pass
    `input_size` to also emit the frozen `pos_embed` entry that a strict
    torch `load_state_dict` expects."""
    p = params["params"] if "params" in params else params
    if "mlp" in p.get("blocks", {}).get("block", {}) and \
            "wi" in p["blocks"]["block"]["mlp"]:
        raise ValueError(
            "flax_to_state_dict: MoE param trees (routed expert MLPs) have "
            "no reference torch format; --export-pt supports dense DiT only")
    sd: Dict[str, np.ndarray] = {}

    kern = np.asarray(p["x_embedder"]["proj"]["kernel"])   # (C*p*p, D)
    d = kern.shape[1]
    sd["x_embedder.proj.weight"] = kern.T.reshape(d, in_channels, patch_size, patch_size)
    sd["x_embedder.proj.bias"] = np.asarray(p["x_embedder"]["proj"]["bias"])

    for tname, (fpath, transpose) in _TOP_MAP.items():
        keys = fpath.split("/")
        node = p
        for k in keys:
            node = node[k]
        arr = np.asarray(node)
        sd[tname] = arr.T if transpose else arr

    block = p["blocks"]["block"]
    depth = np.asarray(block["attn"]["qkv"]["kernel"]).shape[0]
    num_heads = np.asarray(block["attn"]["qkv"]["kernel"]).shape[3]
    for suffix, (fpath, _, exp) in _BLOCK_MAP.items():
        keys = fpath.split("/")
        node = block
        for k in keys:
            node = node[k]
        stacked = np.asarray(node)
        for i in range(depth):
            sd[f"blocks.{i}.{suffix}"] = exp(stacked[i], num_heads)

    if input_size is not None:
        from ..models.pos_embed import get_2d_sincos_pos_embed

        sd["pos_embed"] = get_2d_sincos_pos_embed(
            d, input_size // patch_size).astype(np.float32)[None]
    return sd


def import_dit_checkpoint(path: str, model, prefer_ema: bool = True) -> dict:
    """Load a reference .pt checkpoint into params for `model` (a DiT),
    with shape validation against a fresh init-shaped tree."""
    import jax

    sd = load_torch_checkpoint(path, prefer_ema=prefer_ema)
    params = state_dict_to_flax(sd, depth=model.depth, num_heads=model.num_heads)
    params = jax.tree.map(lambda a: a.astype(np.float32), params)

    # validate shapes against the model's own init structure
    import jax.numpy as jnp

    ref = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, model.in_channels, model.input_size, model.input_size)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1,), jnp.int32),
        )
    )
    ref_flat = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    ref_shapes = {jax.tree_util.keystr(k): v.shape for k, v in ref_flat}
    got_shapes = {jax.tree_util.keystr(k): v.shape for k, v in got_flat}
    if ref_shapes != got_shapes:
        only_ref = set(ref_shapes) - set(got_shapes)
        only_got = set(got_shapes) - set(ref_shapes)
        mismatch = {k: (ref_shapes[k], got_shapes[k])
                    for k in set(ref_shapes) & set(got_shapes)
                    if ref_shapes[k] != got_shapes[k]}
        raise ValueError(
            f"checkpoint/model structure mismatch:\n missing={sorted(only_ref)}\n"
            f" unexpected={sorted(only_got)}\n shape mismatches={mismatch}")
    return params

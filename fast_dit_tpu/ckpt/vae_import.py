"""Import diffusers-format AutoencoderKL weights into the flax VAE.

The reference loads `stabilityai/sd-vae-ft-{ema,mse}` through diffusers
(`/root/reference/sample.py:44`, `train.py:156`); our flax VAE accepts the
same weights from a local diffusers checkpoint file
(`diffusion_pytorch_model.{safetensors,bin}`) — this environment has no
network egress, so weights must be present on disk.

Handles both modern attention names (to_q/to_k/to_v/to_out.0) and the legacy
ones (query/key/value/proj_attn). Convs transpose (O,I,kh,kw)->(kh,kw,I,O);
GroupNorm weight->scale.
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np

__all__ = ["load_vae_state_dict", "vae_state_dict_to_flax", "import_vae_checkpoint"]


def load_vae_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a diffusers VAE checkpoint file (or directory) to {name: numpy}."""
    if os.path.isdir(path):
        for fname in ("diffusion_pytorch_model.safetensors",
                      "diffusion_pytorch_model.bin"):
            cand = os.path.join(path, fname)
            if os.path.isfile(cand):
                path = cand
                break
        else:
            raise FileNotFoundError(f"no VAE weights found under {path}")
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


_ATTN_ALIASES = {
    "query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out",
    "to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out.0": "to_out",
}


def _conv(arr):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(arr, (2, 3, 1, 0))


def _set(tree, path, value):
    node = tree
    keys = path.split("/")
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _map_resnet(prefix_out, name_rest, arr, tree):
    # name_rest like "norm1.weight" / "conv1.weight" / "conv_shortcut.bias"
    mod, leaf = name_rest.rsplit(".", 1)
    if mod.startswith("norm"):
        _set(tree, f"{prefix_out}/{mod}/{'scale' if leaf == 'weight' else 'bias'}", arr)
    else:  # conv1 / conv2 / conv_shortcut
        _set(tree, f"{prefix_out}/{mod}/{'kernel' if leaf == 'weight' else 'bias'}",
             _conv(arr) if leaf == "weight" else arr)


def _map_attn(prefix_out, name_rest, arr, tree):
    mod, leaf = name_rest.rsplit(".", 1)
    if mod == "group_norm":
        _set(tree, f"{prefix_out}/group_norm/{'scale' if leaf == 'weight' else 'bias'}", arr)
        return
    target = _ATTN_ALIASES.get(mod)
    if target is None:
        raise KeyError(f"unknown attention param {name_rest}")
    if leaf == "weight":
        if arr.ndim == 4:  # legacy 1x1-conv attention projections
            arr = arr[:, :, 0, 0]
        _set(tree, f"{prefix_out}/{target}/kernel", arr.T)
    else:
        _set(tree, f"{prefix_out}/{target}/bias", arr)


def vae_state_dict_to_flax(sd: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for name, arr in sd.items():
        arr = np.asarray(arr)
        parts = name.split(".")
        side = parts[0]  # encoder / decoder / quant_conv / post_quant_conv
        if side in ("quant_conv", "post_quant_conv"):
            leaf = parts[1]
            _set(tree, f"{side}/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv(arr) if leaf == "weight" else arr)
            continue
        if side not in ("encoder", "decoder"):
            raise KeyError(f"unknown VAE param: {name}")
        rest = ".".join(parts[1:])

        m = re.match(r"conv_in\.(weight|bias)$", rest)
        if m:
            _set(tree, f"{side}/conv_in/{'kernel' if m.group(1) == 'weight' else 'bias'}",
                 _conv(arr) if m.group(1) == "weight" else arr)
            continue
        m = re.match(r"conv_norm_out\.(weight|bias)$", rest)
        if m:
            _set(tree, f"{side}/conv_norm_out/{'scale' if m.group(1) == 'weight' else 'bias'}", arr)
            continue
        m = re.match(r"conv_out\.(weight|bias)$", rest)
        if m:
            _set(tree, f"{side}/conv_out/{'kernel' if m.group(1) == 'weight' else 'bias'}",
                 _conv(arr) if m.group(1) == "weight" else arr)
            continue
        m = re.match(r"(down|up)_blocks\.(\d+)\.resnets\.(\d+)\.(.+)$", rest)
        if m:
            d, i, j, tail = m.group(1), int(m.group(2)), int(m.group(3)), m.group(4)
            _map_resnet(f"{side}/{d}_{i}_resnet_{j}", tail, arr, tree)
            continue
        m = re.match(r"down_blocks\.(\d+)\.downsamplers\.0\.conv\.(weight|bias)$", rest)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            _set(tree, f"{side}/down_{i}_downsample/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv(arr) if leaf == "weight" else arr)
            continue
        m = re.match(r"up_blocks\.(\d+)\.upsamplers\.0\.conv\.(weight|bias)$", rest)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            _set(tree, f"{side}/up_{i}_upsample/conv/{'kernel' if leaf == 'weight' else 'bias'}",
                 _conv(arr) if leaf == "weight" else arr)
            continue
        m = re.match(r"mid_block\.resnets\.(\d+)\.(.+)$", rest)
        if m:
            _map_resnet(f"{side}/mid_resnet_{m.group(1)}", m.group(2), arr, tree)
            continue
        m = re.match(r"mid_block\.attentions\.0\.(.+)$", rest)
        if m:
            _map_attn(f"{side}/mid_attn", m.group(1), arr, tree)
            continue
        raise KeyError(f"unknown VAE param: {name}")
    return {"params": tree}


def import_vae_checkpoint(path: str, vae=None) -> dict:
    """Load + convert + (optionally) validate against the model structure."""
    import jax
    import jax.numpy as jnp

    params = vae_state_dict_to_flax(load_vae_state_dict(path))
    params = jax.tree.map(lambda a: np.asarray(a, np.float32), params)
    if vae is not None:
        ref = jax.eval_shape(
            lambda: vae.init({"params": jax.random.PRNGKey(0)},
                             jnp.zeros((1, 3, 32, 32)), jax.random.PRNGKey(0)))
        ref_s = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_s = {jax.tree_util.keystr(k): v.shape
                 for k, v in jax.tree_util.tree_flatten_with_path(params)[0]}
        if ref_s != got_s:
            missing = sorted(set(ref_s) - set(got_s))
            extra = sorted(set(got_s) - set(ref_s))
            bad = {k: (ref_s[k], got_s[k]) for k in set(ref_s) & set(got_s)
                   if ref_s[k] != got_s[k]}
            raise ValueError(
                f"VAE checkpoint mismatch: missing={missing} extra={extra} shapes={bad}")
    return params

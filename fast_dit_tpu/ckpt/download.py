"""Pretrained-checkpoint resolver (parity with `/root/reference/download.py`).

`find_model(name)`: known pretrained names download from
`dl.fbaipublicfiles.com/DiT/models/` into `pretrained_models/` (reference
download.py:32-43); anything else is treated as a local path. Training
checkpoints auto-select the `"ema"` weights (reference download.py:26-29).

Returns a flat {name: numpy} torch-style state dict; feed it to
`state_dict_to_flax` / `import_dit_checkpoint` for flax params.
"""

from __future__ import annotations

import os
import urllib.request
from typing import Dict

import numpy as np

from .torch_import import load_torch_checkpoint

__all__ = ["pretrained_models", "find_model", "download_model"]

pretrained_models = {"DiT-XL-2-512x512.pt", "DiT-XL-2-256x256.pt"}

_BASE_URL = "https://dl.fbaipublicfiles.com/DiT/models"


def download_model(model_name: str, cache_dir: str = "pretrained_models") -> str:
    """Download a known pretrained DiT checkpoint (reference download.py:32-43)."""
    assert model_name in pretrained_models, f"unknown pretrained model: {model_name}"
    local_path = os.path.join(cache_dir, model_name)
    if not os.path.isfile(local_path):
        os.makedirs(cache_dir, exist_ok=True)
        url = f"{_BASE_URL}/{model_name}"
        try:
            urllib.request.urlretrieve(url, local_path)  # noqa: S310 — fixed host
        except Exception as e:
            raise RuntimeError(
                f"could not download {url} (offline environment?). "
                f"Place the file manually at {local_path}."
            ) from e
    return local_path


def find_model(model_name: str, cache_dir: str = "pretrained_models") -> Dict[str, np.ndarray]:
    """Name -> state dict, preferring EMA weights (reference download.py:18-29)."""
    if model_name in pretrained_models:
        path = download_model(model_name, cache_dir)
    else:
        assert os.path.isfile(model_name), f"could not find DiT checkpoint at {model_name}"
        path = model_name
    return load_torch_checkpoint(path, prefer_ema=True)

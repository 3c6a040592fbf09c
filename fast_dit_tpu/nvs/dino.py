"""DINO/DINOv2 feature extraction for cross-attention conditioning.

Capability parity with the reference's `DINO` wrapper module
(`/root/reference/models.py:919-1000`), which torch.hub-loads dinov2,
ImageNet-normalizes the input, and taps intermediate transformer layers.
Network-gated here (no egress in this environment): `load_dino` uses
torch.hub when reachable, a torch.hub cache dir, or — for offline use and
tests — a local directory containing a `hubconf.py` (loaded with
`source="local"`, no network). The returned extractor emits
(B, C*len(layers), gh, gw) feature maps shaped for `DiTNVS`'s `dino_feat`
input. `random_dino_features` produces correctly-shaped stand-ins when no
weights are available at all.
"""

from __future__ import annotations

import os
from typing import Callable, Sequence

import numpy as np

__all__ = ["load_dino", "preprocess_images", "random_dino_features"]

DINO_PATCH = 14
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess_images(images: np.ndarray) -> np.ndarray:
    """uint8/float (B, H, W, 3) in [0, 255] -> fp32 NCHW, ImageNet-normalized
    (the transform the reference applies before DINO, models.py:919-1000)."""
    x = np.asarray(images, np.float32) / 255.0
    x = np.transpose(x, (0, 3, 1, 2))
    mean = _IMAGENET_MEAN.reshape(1, 3, 1, 1)
    std = _IMAGENET_STD.reshape(1, 3, 1, 1)
    return (x - mean) / std


def load_dino(model_name: str = "dinov2_vitb14", *, layers: Sequence[int] = (-1,),
              hub_dir: str = None) -> Callable:
    """-> extract(images_uint8 (B, H, W, 3)) -> (B, C*len(layers), gh, gw).

    `layers` are negative indices from the last transformer layer (-1 = final,
    -3 = third-from-last, ...), concatenated along channels in the given
    order. If `hub_dir` contains a `hubconf.py` it is loaded directly with
    `torch.hub.load(..., source="local")` (fully offline); otherwise it is
    used as the torch.hub cache dir for the facebookresearch/dinov2 repo.
    """
    import torch

    if not layers or any(i >= 0 for i in layers):
        raise ValueError(
            f"layers must be negative indices from the last layer, e.g. "
            f"(-1,) or (-1, -3); got {tuple(layers)}")
    n = max(-i for i in layers)

    if hub_dir and os.path.exists(os.path.join(hub_dir, "hubconf.py")):
        model = torch.hub.load(hub_dir, model_name, source="local")
    else:
        if hub_dir:
            torch.hub.set_dir(hub_dir)
        model = torch.hub.load("facebookresearch/dinov2", model_name)
    model.eval()

    def extract(images: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(preprocess_images(images))
        with torch.no_grad():
            # last-n layer maps, each reshaped to (B, C, H/14, W/14)
            feats = model.get_intermediate_layers(x, n=n, reshape=True)
        out = torch.cat([feats[i] for i in layers], dim=1)
        return out.numpy()

    return extract


def random_dino_features(batch: int, grid: int = 16, dim: int = 768,
                         seed: int = 0) -> np.ndarray:
    """Shape-compatible random stand-in features for offline testing."""
    rs = np.random.RandomState(seed)
    return rs.randn(batch, dim, grid, grid).astype(np.float32)

"""DINO/DINOv2 feature extraction for cross-attention conditioning.

Capability parity with the reference's `DINO` wrapper module
(`/root/reference/models.py:919-1000`), which torch.hub-loads dinov2 and taps
intermediate layers. Network-gated here (no egress in this environment):
`load_dino` uses torch.hub when reachable or a local hub cache; the returned
extractor emits (B, C, gh, gw) feature maps shaped for `DiTNVS`'s
`dino_feat` input. For fully offline tests, `random_dino_features` produces
correctly-shaped stand-ins.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

__all__ = ["load_dino", "random_dino_features"]


def load_dino(model_name: str = "dinov2_vitb14", *, layers: Sequence[int] = (-1,),
              hub_dir: str = None) -> Callable:
    """-> extract(images_uint8 (B, H, W, 3)) -> (B, C*len(layers), gh, gw).

    Uses torch.hub (facebookresearch/dinov2); pass `hub_dir` for a local
    cache in offline environments.
    """
    import torch

    if hub_dir:
        torch.hub.set_dir(hub_dir)
    model = torch.hub.load("facebookresearch/dinov2", model_name)
    model.eval()
    patch = 14

    def extract(images: np.ndarray) -> np.ndarray:
        x = torch.from_numpy(np.asarray(images, np.float32) / 255.0)
        x = x.permute(0, 3, 1, 2)
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (x - mean) / std
        B, _, H, W = x.shape
        gh, gw = H // patch, W // patch
        with torch.no_grad():
            feats = model.get_intermediate_layers(x, n=max(abs(i) for i in layers),
                                                  reshape=True)
        taps = [feats[i] for i in layers]
        out = torch.cat(taps, dim=1)
        return out.numpy()

    return extract


def random_dino_features(batch: int, grid: int = 16, dim: int = 768,
                         seed: int = 0) -> np.ndarray:
    """Shape-compatible random stand-in features for offline testing."""
    rs = np.random.RandomState(seed)
    return rs.randn(batch, dim, grid, grid).astype(np.float32)

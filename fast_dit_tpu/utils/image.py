"""Image grid + PNG helpers (torchvision.utils.save_image equivalent for the
reference's `save_image(samples, "sample.png", nrow=4, normalize=True,
value_range=(-1, 1))` call at sample.py:68)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

__all__ = ["make_grid", "save_image", "to_uint8"]


def to_uint8(img_nchw: np.ndarray, value_range=(-1.0, 1.0)) -> np.ndarray:
    """(B, C, H, W) floats -> (B, H, W, C) uint8 with clamp+rescale
    (matches sample_ddp.py:131-132 quantization when value_range=(-1,1))."""
    lo, hi = value_range
    x = (np.asarray(img_nchw, np.float32) - lo) / (hi - lo)
    x = np.clip(x * 255.0 + 0.5, 0, 255).astype(np.uint8)
    return x.transpose(0, 2, 3, 1)


def make_grid(img_nchw: np.ndarray, nrow: int = 4, padding: int = 2,
              value_range=(-1.0, 1.0)) -> np.ndarray:
    """(B, C, H, W) -> (H', W', C) uint8 grid."""
    imgs = to_uint8(img_nchw, value_range)
    B, H, W, C = imgs.shape
    ncol = nrow
    nrows = (B + ncol - 1) // ncol
    grid = np.zeros((nrows * (H + padding) + padding,
                     ncol * (W + padding) + padding, C), np.uint8)
    for i in range(B):
        r, c = divmod(i, ncol)
        y = r * (H + padding) + padding
        x = c * (W + padding) + padding
        grid[y: y + H, x: x + W] = imgs[i]
    return grid


def save_image(img_nchw: np.ndarray, path: str, nrow: int = 4,
               value_range=(-1.0, 1.0)):
    grid = make_grid(np.asarray(img_nchw), nrow=nrow, value_range=value_range)
    if grid.shape[-1] == 1:
        grid = grid[..., 0]
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    Image.fromarray(grid).save(path)

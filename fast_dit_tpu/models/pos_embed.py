"""Frozen 2D sine-cosine positional embeddings.

Produces the same table as the reference's MAE-derived helpers
(`/root/reference/train_options/models_original.py:274-321`): per-axis 1D
embeddings are [sin | cos] over an fp64 omega ladder, concatenated [h | w],
with the grid built width-first (meshgrid(w, h)). Pure numpy — the table is a
compile-time constant baked into the XLA program, never a trainable parameter
(reference models_original.py:174 freezes it).

Provenance: this construction originates in facebookresearch/mae
(util/pos_embed.py, CC-BY-NC 4.0), which the reference credits and copies
verbatim; bit-exact equality of the frozen table is required for `.pt`
checkpoint compatibility, so the math here matches it term for term.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "get_1d_sincos_pos_embed_from_grid",
    "get_2d_sincos_pos_embed_from_grid",
    "get_2d_sincos_pos_embed",
]


def get_1d_sincos_pos_embed_from_grid(embed_dim: int, pos: np.ndarray) -> np.ndarray:
    """(M,) positions -> (M, embed_dim) as [sin | cos]."""
    assert embed_dim % 2 == 0
    omega = np.arange(embed_dim // 2, dtype=np.float64)
    omega /= embed_dim / 2.0
    omega = 1.0 / 10000 ** omega
    pos = pos.reshape(-1)
    out = np.einsum("m,d->md", pos, omega)
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed_from_grid(embed_dim: int, grid: np.ndarray) -> np.ndarray:
    assert embed_dim % 2 == 0
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = False,
                            extra_tokens: int = 0) -> np.ndarray:
    """(grid_size^2, embed_dim) table, optionally prefixed with zero rows."""
    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape([2, 1, grid_size, grid_size])
    pos_embed = get_2d_sincos_pos_embed_from_grid(embed_dim, grid)
    if cls_token and extra_tokens > 0:
        pos_embed = np.concatenate(
            [np.zeros([extra_tokens, embed_dim]), pos_embed], axis=0)
    return pos_embed

"""Epipolar attention: aggregate source-view features along epipolar lines.

Capability parity with the reference's `EpipolarAttention`
(`/root/reference/models.py:296-435`) and `PatchifyAttention` mask
downsampler (:268-284), redesigned: the reference builds the soft weight map
from line endpoints with an accidental Softmax-as-sigmoid and hard-coded CUDA
tensors; here the geometry comes from the fundamental matrix directly
(`nvs/geometry.py`), the band weight is a real sigmoid, and the whole op is a
batched, jit-friendly function. The feature-affinity term the reference
computes but disables (models.py:402 "A not used here") is available via
`use_affinity=True`.

Convention: F satisfies x_tar^T F x_src = 0. The epipolar line of target
pixel i in the SOURCE image is F^T x_tar_i; target pixel i attends over
source pixels near that line.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import _pixel_grid, point_line_distance

__all__ = ["patchify_attention_mask", "epipolar_weight_map", "epipolar_attention"]


def patchify_attention_mask(mask: jnp.ndarray, patch_size: int = 16) -> jnp.ndarray:
    """(B, H, W) mask -> (B, num_patches, 1) per-patch average
    (reference PatchifyAttention, models.py:268-284)."""
    B, H, W = mask.shape
    assert H % patch_size == 0 and W % patch_size == 0, (
        "Height and Width must be divisible by patch_size.")
    gh, gw = H // patch_size, W // patch_size
    x = mask.reshape(B, gh, patch_size, gw, patch_size)
    x = x.mean(axis=(2, 4))
    return x.reshape(B, gh * gw, 1)


def epipolar_weight_map(F: jnp.ndarray, h: int, w: int, *,
                        threshold: float = 0.10, sharpness: float = 5.0) -> jnp.ndarray:
    """(.., 3, 3) F -> (..., h*w target, h*w source) soft epipolar band:
    sigmoid(sharpness * (threshold - d(source_pixel, line(F^T x_tar))))."""
    pts = _pixel_grid(h, w)

    def one(Fi):
        ones = jnp.ones((pts.shape[0], 1), pts.dtype)
        homog = jnp.concatenate([pts, ones], axis=-1)
        lines_in_src = jnp.einsum("ji,nj->ni", Fi, homog)   # F^T x_tar
        d = point_line_distance(lines_in_src, pts)          # (tar, src)
        return jax.nn.sigmoid(sharpness * (threshold - d))

    if F.ndim == 2:
        return one(F)
    return jax.vmap(one)(F.reshape(-1, 3, 3)).reshape(*F.shape[:-2], h * w, h * w)


def epipolar_attention(f_tar: jnp.ndarray, f_src: jnp.ndarray, F: jnp.ndarray, *,
                       threshold: float = 0.10, sharpness: float = 5.0,
                       use_affinity: bool = False) -> jnp.ndarray:
    """(B, C, H, W) target/source feature maps + (B, 3, 3) F ->
    (B, C, H, W) source features aggregated along each target pixel's
    epipolar line (reference EpipolarAttention.forward, models.py:296-407).

    With `use_affinity`, logits add the feature dot-product affinity
    f_tar^T f_src (the term the reference wires but disables).
    """
    B, C, H, W = f_src.shape
    weights = epipolar_weight_map(F, H, W, threshold=threshold,
                                  sharpness=sharpness)      # (B, N_tar, N_src)
    logits = jnp.log(jnp.clip(weights, 1e-12, 1.0))
    if use_affinity:
        src_flat = f_src.reshape(B, C, H * W)
        tar_flat = f_tar.reshape(B, C, H * W)
        affinity = jnp.einsum("bci,bcj->bij", tar_flat, src_flat) * (C ** -0.5)
        logits = logits + affinity
    attn = jax.nn.softmax(logits, axis=-1)
    src_flat = f_src.reshape(B, C, H * W)
    out = jnp.einsum("bij,bcj->bci", attn, src_flat)
    return out.reshape(B, C, H, W)

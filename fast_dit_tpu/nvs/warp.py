"""Depth-based and homography image warping between posed views.

Capability parity with the reference's warp-* script family
(`/root/reference/warp-image-by-depth.py:95-146` depth->3D->transform->
project->scatter, `warp-image.py:45` planar homography,
`warp-scannet-depth.py:110` depth-map warping, valid-pixel stats at
`warp-image-by-depth.py:228`), rebuilt as one batched jax.numpy module with a
scatter-min winner selection (nearest surface wins deterministically — the
reference's Python-loop scatter was last-write-wins in iteration order).

Poses are world->camera [R | t]; depth is positive along +z.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "depth_to_points",
    "transform_points",
    "project_points",
    "warp_image_by_depth",
    "warp_depth_map",
    "homography_from_pose",
    "warp_image_homography",
    "valid_pixel_ratio",
]


def _grid(h, w, dtype=jnp.float32):
    v, u = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                        indexing="ij")
    return u, v


def depth_to_points(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(h, w) depth + intrinsics -> (h, w, 3) camera-space points
    (reference warp-image-by-depth.py:95)."""
    h, w = depth.shape
    u, v = _grid(h, w, depth.dtype)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def transform_points(pts: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) points through x' = R x + t (reference warp-image-by-depth.py:111)."""
    return jnp.einsum("ij,...j->...i", R, pts) + t


def project_points(pts: jnp.ndarray, K: jnp.ndarray):
    """(..., 3) camera points -> ((..., 2) pixels, (...) depth)
    (reference warp-image-by-depth.py:123)."""
    z = pts[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
    u = K[0, 0] * pts[..., 0] / z_safe + K[0, 2]
    v = K[1, 1] * pts[..., 1] / z_safe + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def _scatter_nearest(values, uv, depth, valid, out_hw):
    """Scatter (N, C) values to round(uv) with nearest-depth priority.

    Deterministic: `.at[].set` with duplicate indices makes no ordering
    promise, so the winner is selected explicitly — scatter-min the depth
    (bitcast to int32; order-preserving for the positive depths `valid`
    guarantees), break exact-depth ties by lowest source index with a second
    scatter-min, then write only the unique winner per pixel.
    """
    h, w = out_hw
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    inb = (u >= 0) & (u < w) & (v >= 0) & (v < h) & valid
    flat = jnp.where(inb, v * w + u, h * w)  # out-of-bounds bucket
    big = jnp.iinfo(jnp.int32).max
    zbits = jax.lax.bitcast_convert_type(depth.astype(jnp.float32), jnp.int32)
    zbits = jnp.where(inb, zbits, big)
    best_z = jnp.full((h * w + 1,), big, jnp.int32).at[flat].min(zbits)
    tied = inb & (zbits == best_z[flat])
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    best_i = jnp.full((h * w + 1,), big, jnp.int32).at[flat].min(
        jnp.where(tied, idx, big))
    winner = tied & (idx == best_i[flat])
    flat_w = jnp.where(winner, flat, h * w)
    canvas = jnp.zeros((h * w + 1, values.shape[-1]), values.dtype)
    canvas = canvas.at[flat_w].set(values)
    hit = jnp.zeros((h * w + 1,), jnp.bool_).at[flat].set(True)
    return canvas[:-1].reshape(h, w, -1), hit[:-1].reshape(h, w)


def warp_image_by_depth(src_img, src_depth, K_src, K_tgt, R_rel, t_rel):
    """Reproject (h, w, C) source pixels into the target view.

    Returns (warped (h, w, C), mask (h, w) bool of covered target pixels)
    (reference warp-image-by-depth.py:95-146 flow).
    """
    pts = depth_to_points(src_depth, K_src)
    pts_t = transform_points(pts.reshape(-1, 3), R_rel, t_rel)
    uv, z = project_points(pts_t, K_tgt)
    valid = (z > 1e-6) & (src_depth.reshape(-1) > 0)
    return _scatter_nearest(src_img.reshape(-1, src_img.shape[-1]), uv, z, valid,
                            src_depth.shape)


def warp_depth_map(src_depth, K_src, K_tgt, R_rel, t_rel):
    """Warp the depth map itself: target-view depth of the reprojected
    surface (reference warp-scannet-depth.py:110)."""
    pts = depth_to_points(src_depth, K_src)
    pts_t = transform_points(pts.reshape(-1, 3), R_rel, t_rel)
    uv, z = project_points(pts_t, K_tgt)
    valid = (z > 1e-6) & (src_depth.reshape(-1) > 0)
    warped, mask = _scatter_nearest(z[:, None], uv, z, valid, src_depth.shape)
    return warped[..., 0], mask


def homography_from_pose(K_src, K_tgt, R_rel, t_rel, *, plane_normal=None,
                         plane_distance: float = 1.0):
    """Planar homography H = K_tgt (R + t n^T / d) K_src^-1
    (reference warp-image.py:45 planar assumption)."""
    n = jnp.array([0.0, 0.0, 1.0]) if plane_normal is None else plane_normal
    H = K_tgt @ (R_rel + jnp.outer(t_rel, n) / plane_distance) @ jnp.linalg.inv(K_src)
    return H / H[2, 2]


def warp_image_homography(src_img, H):
    """Backward-warp (h, w, C) through homography H (nearest sampling)."""
    h, w, _ = src_img.shape
    u, v = _grid(h, w)
    ones = jnp.ones_like(u)
    tgt = jnp.stack([u, v, ones], axis=-1).reshape(-1, 3)
    src = jnp.einsum("ij,nj->ni", jnp.linalg.inv(H), tgt)
    src = src[:, :2] / jnp.maximum(jnp.abs(src[:, 2:3]), 1e-8) * jnp.sign(src[:, 2:3])
    su = jnp.round(src[:, 0]).astype(jnp.int32)
    sv = jnp.round(src[:, 1]).astype(jnp.int32)
    inb = (su >= 0) & (su < w) & (sv >= 0) & (sv < h)
    su = jnp.clip(su, 0, w - 1)
    sv = jnp.clip(sv, 0, h - 1)
    out = src_img[sv, su]
    out = jnp.where(inb[:, None], out, 0)
    return out.reshape(h, w, -1), inb.reshape(h, w)


def valid_pixel_ratio(mask: jnp.ndarray) -> jnp.ndarray:
    """Fraction of covered target pixels (reference warp-image-by-depth.py:228)."""
    return jnp.mean(mask.astype(jnp.float32))

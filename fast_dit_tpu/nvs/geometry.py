"""Multi-view geometry for novel-view synthesis, in jax.numpy.

Capability parity with the reference's ring-3 research scripts, rebuilt as
one clean module (SURVEY.md §2.4 rebuild note): quaternion/rotation and
fundamental-matrix math (`/root/reference/models.py:115-209`,
`epipolar-atten-test.py:52`), epipolar distance maps
(`models.py:409-435`), Plücker ray embeddings
(`pluecker-coordinate.py:47-88`), Google-style raymaps
(`models.py:466-496`), and 2D Fourier coordinate features
(`fourier-embeddings.py:4-49`). All functions are pure jax.numpy (jit/vmap
friendly) and batched where meaningful.

Conventions: quaternions are (w, x, y, z); poses are world->camera
[R | t] with x_cam = R @ x_world + t; pixels are (u, v) with u = column.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn import sigmoid as jax_sigmoid

__all__ = [
    "quaternion_to_rotation_matrix",
    "skew",
    "relative_pose",
    "essential_matrix",
    "fundamental_matrix",
    "epipolar_lines",
    "point_line_distance",
    "epipolar_distance_map",
    "plucker_coordinates",
    "raymap",
    "fourier_features",
    "scale_intrinsics",
]


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = (q[..., i] for i in range(4))
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(*q.shape[:-1], 3, 3)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix [v]_x."""
    zero = jnp.zeros_like(v[..., 0])
    rows = jnp.stack([
        zero, -v[..., 2], v[..., 1],
        v[..., 2], zero, -v[..., 0],
        -v[..., 1], v[..., 0], zero,
    ], axis=-1)
    return rows.reshape(*v.shape[:-1], 3, 3)


def relative_pose(R1, t1, R2, t2):
    """World->cam poses for views 1, 2 -> (R_rel, t_rel) mapping cam1->cam2:
    x2 = R_rel x1 + t_rel."""
    R_rel = R2 @ R1.swapaxes(-1, -2)
    t_rel = t2 - jnp.einsum("...ij,...j->...i", R_rel, t1)
    return R_rel, t_rel


def essential_matrix(R_rel, t_rel):
    """E = [t]_x R for the cam1->cam2 relative pose."""
    return skew(t_rel) @ R_rel


def fundamental_matrix(K1, K2, R_rel, t_rel, *, rank2_project: bool = True):
    """F = K2^-T [t]_x R K1^-1, optionally SVD-projected to rank 2
    (the reference's rank-2 cleanup at models.py:155-187)."""
    E = essential_matrix(R_rel, t_rel)
    F = jnp.linalg.inv(K2).swapaxes(-1, -2) @ E @ jnp.linalg.inv(K1)
    if rank2_project:
        u, s, vt = jnp.linalg.svd(F)
        s = s.at[..., 2].set(0.0)
        F = (u * s[..., None, :]) @ vt
    F = F / jnp.where(jnp.abs(F[..., 2:3, 2:3]) > 1e-12, F[..., 2:3, 2:3], 1.0)
    return F


def epipolar_lines(F, pts_uv):
    """(..., 3, 3) F and (..., N, 2) pixels in image 1 -> (..., N, 3) lines
    ax + by + c = 0 in image 2."""
    ones = jnp.ones((*pts_uv.shape[:-1], 1), pts_uv.dtype)
    homog = jnp.concatenate([pts_uv, ones], axis=-1)
    return jnp.einsum("...ij,...nj->...ni", F, homog)


def point_line_distance(lines, pts_uv):
    """(..., N, 3) lines and (..., M, 2) points -> (..., N, M) distances."""
    ones = jnp.ones((*pts_uv.shape[:-1], 1), pts_uv.dtype)
    homog = jnp.concatenate([pts_uv, ones], axis=-1)
    num = jnp.abs(jnp.einsum("...ni,...mi->...nm", lines, homog))
    den = jnp.linalg.norm(lines[..., :2], axis=-1, keepdims=True)
    return num / jnp.maximum(den, 1e-12)


def _pixel_grid(h, w, dtype=jnp.float32):
    v, u = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                        indexing="ij")
    return jnp.stack([u + 0.5, v + 0.5], axis=-1).reshape(-1, 2)  # pixel centers


def epipolar_distance_map(F, h: int, w: int, *, softmax_temp: float = None,
                          threshold: float = None):
    """Distance from every target pixel to the epipolar line of every source
    pixel: (h*w source, h*w target). With `threshold`, returns the soft
    within-band weight map the reference feeds its epipolar attention
    (models.py:296-435): sigmoid((threshold - d) / temp)."""
    pts = _pixel_grid(h, w)
    lines = epipolar_lines(F, pts)              # (N, 3) for N = h*w
    d = point_line_distance(lines, pts)         # (N source, M target)
    if threshold is None:
        return d
    temp = softmax_temp if softmax_temp is not None else 1.0
    return jax_sigmoid((threshold - d) / temp)


def plucker_coordinates(K, R, t, h: int, w: int):
    """Per-pixel Plücker ray embedding (d, o x d): (h, w, 6)
    (reference pluecker-coordinate.py:47-88).

    (R, t) is world->camera; rays are emitted in world coordinates from the
    camera center o = -R^T t.
    """
    pts = _pixel_grid(h, w)                                  # (N, 2)
    ones = jnp.ones((pts.shape[0], 1), pts.dtype)
    homog = jnp.concatenate([pts, ones], axis=-1)            # (N, 3)
    dirs_cam = jnp.einsum("ij,nj->ni", jnp.linalg.inv(K), homog)
    dirs_world = jnp.einsum("ji,nj->ni", R, dirs_cam)        # R^T d
    dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
    origin = -jnp.einsum("ji,j->i", R, t)                    # -R^T t
    moment = jnp.cross(jnp.broadcast_to(origin, dirs_world.shape), dirs_world)
    return jnp.concatenate([dirs_world, moment], axis=-1).reshape(h, w, 6)


def raymap(K, R, t, h: int, w: int):
    """Google-style 6-channel raymap (origins | directions): (h, w, 6)
    (reference models.py:466-496), ready to concat to latent channels."""
    pl = plucker_coordinates(K, R, t, h, w)
    dirs = pl[..., :3]
    origin = -jnp.einsum("ji,j->i", R, t)
    origins = jnp.broadcast_to(origin, dirs.shape)
    return jnp.concatenate([origins, dirs], axis=-1)


def scale_intrinsics(K: jnp.ndarray, sx: float, sy: float = None) -> jnp.ndarray:
    """Rescale an intrinsics matrix for a resized image (RealEstate10K-style
    normalized-intrinsics handling, reference evaluation-metrics.py:440-456
    and warp-image-numpy-real-estate.py:267): fx,cx scale by sx; fy,cy by sy.
    For normalized intrinsics, pass the target width/height directly."""
    sy = sx if sy is None else sy
    s = jnp.array([[sx, 1.0, sx], [1.0, sy, sy], [1.0, 1.0, 1.0]], K.dtype)
    return K * s


def fourier_features(coords: jnp.ndarray, num_bands: int = 6,
                     max_freq: float = 10.0) -> jnp.ndarray:
    """Multi-scale sin/cos features of (..., D) coordinates ->
    (..., D * 2 * num_bands) (reference fourier-embeddings.py:4-49)."""
    freqs = 2.0 ** jnp.linspace(0.0, jnp.log2(max_freq), num_bands)
    ang = coords[..., None] * freqs                          # (..., D, B)
    feats = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return feats.reshape(*coords.shape[:-1], -1)

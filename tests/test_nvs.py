"""NVS module tests: geometry via synthetic-scene invariants, warps via
zero-motion/known-motion cases, metrics via closed-form values, and the
DINO-conditioned DiT variant (with the fork's bugs fixed by construction)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.nvs import DiTNVS, geometry, metrics, warp


# ---------------------------------------------------------------------------
# synthetic two-view scene
# ---------------------------------------------------------------------------

K = jnp.array([[50.0, 0.0, 32.0], [0.0, 50.0, 32.0], [0.0, 0.0, 1.0]])


def two_cameras(seed=0):
    rs = np.random.RandomState(seed)
    q = rs.randn(4)
    R2 = geometry.quaternion_to_rotation_matrix(jnp.asarray(q))
    t2 = jnp.asarray(rs.randn(3) * 0.2)
    R1 = jnp.eye(3)
    t1 = jnp.zeros(3)
    return (R1, t1), (R2, t2)


def project(K, R, t, X):
    x = jnp.einsum("ij,nj->ni", R, X) + t
    uv = jnp.einsum("ij,nj->ni", K, x)
    return uv[:, :2] / uv[:, 2:3]


def test_quaternion_identity_and_orthogonality():
    R = geometry.quaternion_to_rotation_matrix(jnp.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-7)
    # 90 deg about z: (w, x, y, z) = (cos45, 0, 0, sin45)
    R = geometry.quaternion_to_rotation_matrix(
        jnp.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]))
    np.testing.assert_allclose(np.asarray(R @ jnp.array([1.0, 0, 0])),
                               [0, 1, 0], atol=1e-6)
    q = jnp.asarray(np.random.RandomState(0).randn(5, 4))
    Rs = geometry.quaternion_to_rotation_matrix(q)
    eye = np.eye(3)[None].repeat(5, 0)
    np.testing.assert_allclose(np.asarray(Rs @ Rs.swapaxes(-1, -2)), eye, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(Rs)), 1.0, atol=1e-6)


def test_skew_is_cross_product():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([-2.0, 0.5, 4.0])
    np.testing.assert_allclose(np.asarray(geometry.skew(a) @ b),
                               np.cross(np.asarray(a), np.asarray(b)), atol=1e-6)


def test_fundamental_matrix_epipolar_constraint():
    """x2^T F x1 ~= 0 for true correspondences in a synthetic scene."""
    (R1, t1), (R2, t2) = two_cameras()
    X = jnp.asarray(np.random.RandomState(1).rand(50, 3) * [2, 2, 1] + [-1, -1, 2.5])
    uv1 = project(K, R1, t1, X)
    uv2 = project(K, R2, t2, X)
    R_rel, t_rel = geometry.relative_pose(R1, t1, R2, t2)
    F = geometry.fundamental_matrix(K, K, R_rel, t_rel)
    ones = jnp.ones((50, 1))
    x1 = jnp.concatenate([uv1, ones], 1)
    x2 = jnp.concatenate([uv2, ones], 1)
    residual = jnp.einsum("ni,ij,nj->n", x2, F, x1)
    assert float(jnp.abs(residual).max()) < 1e-3
    # rank-2
    assert float(jnp.linalg.svd(F)[1][2]) < 1e-6


def test_epipolar_lines_pass_through_correspondences():
    (R1, t1), (R2, t2) = two_cameras()
    X = jnp.asarray(np.random.RandomState(2).rand(20, 3) * [2, 2, 1] + [-1, -1, 2.5])
    uv1 = project(K, R1, t1, X)
    uv2 = project(K, R2, t2, X)
    R_rel, t_rel = geometry.relative_pose(R1, t1, R2, t2)
    F = geometry.fundamental_matrix(K, K, R_rel, t_rel)
    lines = geometry.epipolar_lines(F, uv1)
    d = geometry.point_line_distance(lines, uv2)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(d)), 0.0, atol=1e-3)


def test_epipolar_distance_map():
    (R1, t1), (R2, t2) = two_cameras()
    R_rel, t_rel = geometry.relative_pose(R1, t1, R2, t2)
    F = geometry.fundamental_matrix(K, K, R_rel, t_rel)
    d = geometry.epipolar_distance_map(F, 8, 8)
    assert d.shape == (64, 64)
    w = geometry.epipolar_distance_map(F, 8, 8, threshold=2.0, softmax_temp=0.5)
    assert float(w.min()) >= 0 and float(w.max()) <= 1


def test_plucker_rays_hit_their_pixels():
    """o + s*d must project back to the generating pixel."""
    (_, _), (R, t) = two_cameras(3)
    pl = geometry.plucker_coordinates(K, R, t, 8, 8)
    assert pl.shape == (8, 8, 6)
    dirs = pl[..., :3].reshape(-1, 3)
    origin = -jnp.einsum("ji,j->i", R, t)
    pts = origin[None] + 3.7 * dirs                 # any positive s
    uv = project(K, R, t, pts)
    expected = geometry._pixel_grid(8, 8)
    np.testing.assert_allclose(np.asarray(uv), np.asarray(expected), atol=1e-3)
    # moment = o x d
    np.testing.assert_allclose(
        np.asarray(pl[..., 3:].reshape(-1, 3)),
        np.cross(np.broadcast_to(origin, dirs.shape), np.asarray(dirs)), atol=1e-5)


def test_raymap():
    (_, _), (R, t) = two_cameras(4)
    rm = geometry.raymap(K, R, t, 4, 4)
    assert rm.shape == (4, 4, 6)
    origin = -np.asarray(R).T @ np.asarray(t)
    np.testing.assert_allclose(np.asarray(rm[..., :3]),
                               np.broadcast_to(origin, (4, 4, 3)), atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(rm[..., 3:]), axis=-1),
                               1.0, atol=1e-5)


def test_fourier_features():
    coords = jnp.asarray(np.random.RandomState(0).rand(4, 4, 2))
    f = geometry.fourier_features(coords, num_bands=6)
    assert f.shape == (4, 4, 2 * 2 * 6)
    np.testing.assert_allclose(
        np.asarray(geometry.fourier_features(jnp.zeros((1, 2)), 3)).reshape(2, 6),
        np.concatenate([np.zeros((2, 3)), np.ones((2, 3))], -1), atol=1e-7)


# ---------------------------------------------------------------------------
# warping
# ---------------------------------------------------------------------------

def test_warp_identity_motion():
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(16, 16, 3).astype(np.float32))
    depth = jnp.full((16, 16), 2.0)
    warped, mask = warp.warp_image_by_depth(img, depth, K, K, jnp.eye(3), jnp.zeros(3))
    assert bool(mask.all())
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-6)


def test_warp_depth_known_translation():
    depth = jnp.full((16, 16), 2.0)
    t_rel = jnp.array([0.0, 0.0, -0.5])  # move camera toward the plane
    warped, mask = warp.warp_depth_map(depth, K, K, jnp.eye(3), t_rel)
    got = np.asarray(warped)[np.asarray(mask)]
    np.testing.assert_allclose(got, 1.5, atol=1e-5)


def test_homography_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3).astype(np.float32))
    H = warp.homography_from_pose(K, K, jnp.eye(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(H), np.eye(3), atol=1e-6)
    out, mask = warp.warp_image_homography(img, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)
    assert bool(mask.all())


def test_valid_pixel_ratio():
    mask = jnp.array([[True, False], [True, True]])
    assert float(warp.valid_pixel_ratio(mask)) == 0.75


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_psnr():
    a = np.zeros((8, 8))
    assert metrics.psnr(a, a) == float("inf")
    b = a + 10.0
    np.testing.assert_allclose(metrics.psnr(a, b, 255.0),
                               20 * np.log10(255) - 10 * np.log10(100), rtol=1e-6)


def test_ssim_bounds():
    rs = np.random.RandomState(0)
    a = rs.rand(32, 32) * 255
    assert metrics.ssim(a, a) == pytest.approx(1.0, abs=1e-9)
    b = rs.rand(32, 32) * 255
    assert metrics.ssim(a, b) < 0.2


def test_frechet_distance_zero_and_mean_shift():
    mu = np.zeros(4)
    sigma = np.eye(4)
    assert metrics.frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0, abs=1e-6)
    mu2 = np.ones(4)
    assert metrics.frechet_distance(mu, sigma, mu2, sigma) == pytest.approx(4.0, abs=1e-5)


def test_fid_kid_with_injected_features():
    rs = np.random.RandomState(0)
    feature_fn = lambda imgs: imgs.reshape(len(imgs), -1)
    a = rs.randn(200, 16)
    b = rs.randn(200, 16)
    c = rs.randn(200, 16) + 3.0
    # finite-sample noise keeps same-distribution FID slightly above 0
    assert metrics.compute_fid(a, b, feature_fn) < 2.0
    assert metrics.compute_fid(a, c, feature_fn) > 50
    kid_same, _ = metrics.compute_kid(a, b, feature_fn, subset_size=100)
    kid_diff, _ = metrics.compute_kid(a, c, feature_fn, subset_size=100)
    assert abs(kid_same) < 0.05 and kid_diff > 1.0


def test_inception_score_bounds():
    n, c = 100, 10
    uniform = np.full((n, c), 1.0 / c)
    is_u, _ = metrics.inception_score(uniform)
    assert is_u == pytest.approx(1.0, abs=1e-6)
    onehot = np.eye(c)[np.arange(n) % c] * 0.999 + 1e-4
    is_o, _ = metrics.inception_score(onehot)
    assert is_o > 5.0


def test_tsed_identical_images():
    cv2 = pytest.importorskip("cv2")
    rs = np.random.RandomState(0)
    img = (rs.rand(128, 128, 3) * 255).astype(np.uint8)
    # pure x-translation: epipolar lines are horizontal rows
    t_rel = jnp.array([1.0, 0.0, 0.0])
    F = geometry.fundamental_matrix(K, K, jnp.eye(3), t_rel, rank2_project=False)
    score = metrics.compute_tsed(img, img, np.asarray(F), threshold=2.0)
    assert score is not None and score > 0.9


def test_symmetric_epipolar_distance_zero_for_correspondences():
    (R1, t1), (R2, t2) = two_cameras()
    X = jnp.asarray(np.random.RandomState(5).rand(30, 3) * [2, 2, 1] + [-1, -1, 2.5])
    uv1 = np.asarray(project(K, R1, t1, X))
    uv2 = np.asarray(project(K, R2, t2, X))
    R_rel, t_rel = geometry.relative_pose(R1, t1, R2, t2)
    F = np.asarray(geometry.fundamental_matrix(K, K, R_rel, t_rel))
    d = metrics.symmetric_epipolar_distance(uv1, uv2, F)
    assert d.max() < 1e-2


# ---------------------------------------------------------------------------
# DINO-conditioned DiT
# ---------------------------------------------------------------------------

def nvs_model(**kw):
    kw.setdefault("input_size", 16)
    kw.setdefault("patch_size", 4)
    kw.setdefault("hidden_size", 32)
    kw.setdefault("depth", 3)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_classes", 10)
    kw.setdefault("dino_dim", 24)
    kw.setdefault("cross_layers", (1,))
    kw.setdefault("attn_backend", "xla")
    return DiTNVS(**kw)


def nvs_inputs(B=2):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 16, 16))
    t = jnp.arange(B)
    y = jnp.arange(B) % 10
    dino = jax.random.normal(jax.random.PRNGKey(1), (B, 24, 4, 4))
    return x, t, dino, y


def test_nvs_forward_shape_and_zero_init():
    m = nvs_model(cross_layers=(1,))
    x, t, dino, y = nvs_inputs()
    params = m.init({"params": jax.random.PRNGKey(0)}, x, t, dino, y)
    out = m.apply(params, x, t, dino, y)
    assert out.shape == (2, 8, 16, 16)
    np.testing.assert_array_equal(np.asarray(out), 0.0)  # adaLN-Zero


def test_cross_layers_gate_dino_influence():
    """DINO features must influence the output iff a cross layer is active."""
    x, t, dino, y = nvs_inputs()
    dino2 = dino + 1.0
    for layers, should_differ in [((), False), ((1,), True)]:
        m = nvs_model(cross_layers=layers)
        params = m.init({"params": jax.random.PRNGKey(0)}, x, t, dino, y)
        params = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape) * 0.05,
            params)
        a = np.asarray(m.apply(params, x, t, dino, y))
        b = np.asarray(m.apply(params, x, t, dino2, y))
        assert np.allclose(a, b) != should_differ, layers


def test_nvs_forward_with_cfg_fixed_arity():
    """The fork's forward_with_cfg crashes on its own model (models.py:763);
    ours must run and produce matched guided halves."""
    m = nvs_model(cross_layers=(0, 2))
    x, t, dino, y = nvs_inputs(B=4)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, t, dino, y)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape) * 0.05, params)
    out = m.apply(params, x, jnp.zeros(4, jnp.int32), dino,
                  jnp.array([1, 2, 10, 10]), method=m.forward_with_cfg,
                  cfg_scale=2.0)
    assert out.shape == (4, 8, 16, 16)
    np.testing.assert_allclose(np.asarray(out[:2, :3]), np.asarray(out[2:, :3]),
                               rtol=1e-5, atol=1e-6)


def test_condition_on_labels_flag():
    x, t, dino, y = nvs_inputs()
    m = nvs_model(condition_on_labels=False)
    params = m.init({"params": jax.random.PRNGKey(0)}, x, t, dino, y)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape) * 0.05, params)
    a = np.asarray(m.apply(params, x, t, dino, y))
    b = np.asarray(m.apply(params, x, t, dino, (y + 1) % 10))
    np.testing.assert_array_equal(a, b)  # fork semantics: c = t only

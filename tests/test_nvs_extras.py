"""Tests for the remaining ring-3 capabilities: epipolar attention,
diffusion inpainting, pose converters, viz/video utilities."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import DiffusionSchedule, get_named_beta_schedule
from fast_dit_tpu.nvs import (
    epipolar_attention,
    epipolar_weight_map,
    geometry,
    inpaint_sample_loop,
    mask_from_black_pixels,
    patchify_attention_mask,
    pose_io,
)
from fast_dit_tpu.utils.viz import (
    attention_overlay,
    colorize,
    depth_to_color,
    embed_features_2d,
    error_heatmap,
)

K = jnp.array([[20.0, 0, 8], [0, 20.0, 8], [0, 0, 1]])


def test_patchify_attention_mask():
    mask = jnp.ones((2, 32, 32)).at[:, :16].set(0.0)
    out = patchify_attention_mask(mask, patch_size=16)
    assert out.shape == (2, 4, 1)
    np.testing.assert_allclose(np.asarray(out[:, :, 0]),
                               [[0, 0, 1, 1], [0, 0, 1, 1]])


def test_epipolar_weight_map_band():
    R = geometry.quaternion_to_rotation_matrix(jnp.array([0.95, 0.1, 0.2, 0.1]))
    t = jnp.array([0.3, 0.0, 0.05])
    F = geometry.fundamental_matrix(K, K, R, t)
    w = epipolar_weight_map(F, 8, 8, threshold=1.0, sharpness=5.0)
    assert w.shape == (64, 64)
    assert 0 <= float(w.min()) and float(w.max()) <= 1
    # a real band: some pixels near the line, most far
    assert 0.01 < float((w > 0.5).mean()) < 0.9


def test_epipolar_attention_aggregates_on_line():
    """With identity-ish geometry (pure x translation), the epipolar line of
    a target pixel is its own row in the source image — so attending a
    source image whose values vary only by ROW must return (approximately)
    the target pixel's own row value."""
    t_rel = jnp.array([1.0, 0.0, 0.0])
    F = geometry.fundamental_matrix(K, K, jnp.eye(3), t_rel, rank2_project=False)
    H = W = 16
    row_vals = jnp.arange(H, dtype=jnp.float32)
    f_src = jnp.broadcast_to(row_vals[None, None, :, None], (1, 1, H, W))
    f_tar = jnp.zeros((1, 1, H, W))
    out = epipolar_attention(f_tar, f_src, F[None], threshold=0.5, sharpness=20.0)
    got = np.asarray(out[0, 0])
    expected = np.broadcast_to(np.arange(H, dtype=np.float32)[:, None], (H, W))
    np.testing.assert_allclose(got, expected, atol=0.15)


def test_epipolar_attention_affinity_option():
    F = geometry.fundamental_matrix(K, K, jnp.eye(3), jnp.array([1.0, 0, 0]),
                                    rank2_project=False)
    f_src = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    f_tar = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    a = epipolar_attention(f_tar, f_src, F[None], use_affinity=False)
    b = epipolar_attention(f_tar, f_src, F[None], use_affinity=True)
    assert a.shape == b.shape == (1, 4, 8, 8)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_mask_from_black_pixels():
    img = np.full((4, 4, 3), 255, np.uint8)
    img[1, 2] = 0
    img[3, 3] = [0, 0, 1]  # not fully black
    m = mask_from_black_pixels(img)
    assert m[1, 2] and not m[3, 3] and m.sum() == 1


def test_inpaint_preserves_known_and_fills_holes():
    sched = DiffusionSchedule.create(get_named_beta_schedule("linear", 100))
    known = jnp.ones((1, 4, 8, 8)) * 0.5
    mask = jnp.zeros((1, 1, 8, 8)).at[:, :, 2:6, 2:6].set(1.0)

    def model_fn(x, t):  # predicts eps=0, min variance
        return jnp.concatenate([jnp.zeros_like(x), -jnp.ones_like(x)], axis=1)

    out = inpaint_sample_loop(model_fn, known, mask, sched,
                              rng=jax.random.PRNGKey(0))
    out = np.asarray(out)
    # known region pinned exactly
    np.testing.assert_array_equal(out[0, :, 0, 0], 0.5)
    np.testing.assert_array_equal(out[0, :, 7, 7], 0.5)
    # holes filled with something finite and different
    assert np.isfinite(out).all()
    assert not np.allclose(out[0, :, 3, 3], 0.5)


def test_inpaint_resampling_runs():
    sched = DiffusionSchedule.create(get_named_beta_schedule("linear", 50))
    known = jnp.zeros((1, 4, 8, 8))
    mask = jnp.ones((1, 1, 8, 8))
    model_fn = lambda x, t: jnp.concatenate(
        [jnp.zeros_like(x), -jnp.ones_like(x)], axis=1)
    out = inpaint_sample_loop(model_fn, known, mask, sched,
                              rng=jax.random.PRNGKey(0), jump_n=3)
    assert np.isfinite(np.asarray(out)).all()


def test_orb_to_blender_roundtrip_properties():
    # identity ORB pose -> a pure axis permutation, still a rigid transform
    out = pose_io.orb_to_blender(np.eye(4))
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(abs(np.linalg.det(R)), 1.0, atol=1e-12)


def test_convert_poses_to_json(tmp_path):
    rows = []
    for i in range(3):
        pose = np.eye(4)
        pose[:3, 3] = [i * 0.1, 0, 0]
        vals = [i, 500.0, 500.0, 320.0, 240.0] + pose[:3].reshape(-1).tolist() + [0, 0, 0, 1]
        # file rows carry 4x4 rows 0..2 then the last row is implied
        rows.append(" ".join(map(str, [i, 500.0, 500.0, 320.0, 240.0]
                                  + pose.reshape(-1)[:12].tolist())))
    inp = tmp_path / "poses.txt"
    inp.write_text("\n".join(rows))
    out = tmp_path / "poses.json"
    data = pose_io.convert_poses_to_json(str(inp), str(out))
    assert data["focal_x"] == 500.0 and data["center_y"] == 240.0
    assert len(data["poses"]) == 3
    assert data["dependencies"][0] is None
    assert data["generation_order"] == [1, 2]
    assert json.loads(out.read_text())["focal_y"] == 500.0


def test_realestate_txt(tmp_path):
    frames = tmp_path / "rgb"
    os.makedirs(frames)
    for ts in ["100", "200"]:
        (frames / f"{ts}.png").write_bytes(b"")
    entries = [{
        "timestamp": ts,
        "intrinsics": [[500.0, 0, 320.0], [0, 501.0, 240.0], [0, 0, 1]],
        "pose": np.eye(4).tolist(),
    } for ts in ["100", "200", "300"]]
    jpath = tmp_path / "scene.json"
    jpath.write_text(json.dumps(entries))
    out = tmp_path / "poses.txt"
    n = pose_io.write_realestate_txt(str(jpath), str(frames), str(out))
    assert n == 2
    lines = out.read_text().splitlines()
    parts = lines[0].split()
    assert parts[0] == "100"
    assert [float(p) for p in parts[1:5]] == [500.0, 501.0, 320.0, 240.0]
    assert len(parts) == 1 + 4 + 12


def test_viz_helpers():
    rs = np.random.RandomState(0)
    a = rs.rand(16, 16, 3) * 255
    b = rs.rand(16, 16, 3) * 255
    hm = error_heatmap(a, b)
    assert hm.shape == (16, 16, 3) and hm.dtype == np.uint8
    d = depth_to_color(rs.rand(8, 8))
    assert d.shape == (8, 8, 3)
    img = (rs.rand(32, 32, 3) * 255).astype(np.uint8)
    ov = attention_overlay(img, rs.rand(8, 8))
    assert ov.shape == (32, 32, 3)
    c = colorize(np.zeros((4, 4)))
    assert c.shape == (4, 4, 3)


def test_embed_features_2d_tsne():
    feats = np.random.RandomState(0).randn(30, 8)
    emb = embed_features_2d(feats, method="tsne")
    assert emb.shape == (30, 2)


def test_video_gen(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from fast_dit_tpu.utils.video import images_to_video

    folder = tmp_path / "frames"
    os.makedirs(folder)
    for i in range(5):
        from PIL import Image
        Image.fromarray(np.full((32, 32, 3), i * 40, np.uint8)).save(
            str(folder / f"{i:03d}.png"))
    out = str(tmp_path / "out.mp4")
    n = images_to_video(str(folder), out, fps=5)
    assert n == 5 and os.path.getsize(out) > 0


# --------------------------------------------------------------------------
# DINO extractor, offline: a local stub hub repo exercises everything except
# the network fetch itself (preprocessing, layer taps, channel concat) —
# reference /root/reference/models.py:919-1000
# --------------------------------------------------------------------------

_STUB_HUBCONF = '''
import torch

dependencies = []


class _StubDino(torch.nn.Module):
    """get_intermediate_layers-compatible stand-in: layer k (counted from the
    final layer backwards, -1 = final) emits a constant map of value
    mean(input) + depth_index so taps and their order are checkable."""

    depth = 12

    def get_intermediate_layers(self, x, n=1, reshape=False):
        assert reshape, "extractor always requests reshaped (B,C,gh,gw) maps"
        B, _, H, W = x.shape
        gh, gw = H // 14, W // 14
        base = x.mean()
        return tuple(
            torch.full((B, 4, gh, gw), float(base + (self.depth - n + i)))
            for i in range(n)
        )


def dinov2_vitb14(**kwargs):
    return _StubDino()
'''


def test_dino_preprocess_images():
    from fast_dit_tpu.nvs.dino import preprocess_images

    img = np.zeros((2, 28, 28, 3), np.uint8)
    img[..., 0] = 255  # pure red
    x = preprocess_images(img)
    assert x.shape == (2, 3, 28, 28) and x.dtype == np.float32
    np.testing.assert_allclose(x[:, 0], (1.0 - 0.485) / 0.229, rtol=1e-5)
    np.testing.assert_allclose(x[:, 1], (0.0 - 0.456) / 0.224, rtol=1e-5)
    np.testing.assert_allclose(x[:, 2], (0.0 - 0.406) / 0.225, rtol=1e-5)


def test_load_dino_local_stub(tmp_path):
    torch = pytest.importorskip("torch")
    from fast_dit_tpu.nvs.dino import load_dino, preprocess_images

    (tmp_path / "hubconf.py").write_text(_STUB_HUBCONF)

    img = np.full((2, 28, 42, 3), 128, np.uint8)
    base = preprocess_images(img).mean()

    extract = load_dino(layers=(-1,), hub_dir=str(tmp_path))
    out = extract(img)
    assert out.shape == (2, 4, 2, 3)  # 28/14 x 42/14 patch grid
    np.testing.assert_allclose(out, base + 11, rtol=1e-5)  # final layer = 11

    # multilayer taps concat along channels in the order given
    extract = load_dino(layers=(-1, -3), hub_dir=str(tmp_path))
    out = extract(img)
    assert out.shape == (2, 8, 2, 3)
    np.testing.assert_allclose(out[:, :4], base + 11, rtol=1e-5)
    np.testing.assert_allclose(out[:, 4:], base + 9, rtol=1e-5)


def test_load_dino_rejects_nonnegative_layers(tmp_path):
    pytest.importorskip("torch")
    from fast_dit_tpu.nvs.dino import load_dino

    with pytest.raises(ValueError):
        load_dino(layers=(0,), hub_dir=str(tmp_path))
    with pytest.raises(ValueError):
        load_dino(layers=(), hub_dir=str(tmp_path))

"""Data-layer tests: ADM crop parity, feature dataset/batcher, image grid."""

import os

import numpy as np
import pytest
from PIL import Image

from fast_dit_tpu.data import (
    FeatureDataset,
    ImageFolderIndex,
    center_crop_arr,
    feature_batches,
    load_image,
    synthetic_features,
)
from fast_dit_tpu.utils.image import make_grid, save_image, to_uint8


def random_pil(w, h, seed=0):
    rs = np.random.RandomState(seed)
    return Image.fromarray(rs.randint(0, 255, (h, w, 3), dtype=np.uint8))


def test_center_crop_shapes():
    for (w, h) in [(640, 480), (480, 640), (1024, 1024), (300, 200), (256, 256)]:
        out = center_crop_arr(random_pil(w, h), 256)
        assert out.size == (256, 256), (w, h)


def test_center_crop_matches_reference_algorithm():
    """Independent re-derivation of the ADM crop sequence on a gradient image."""
    img = Image.fromarray(
        (np.arange(600 * 800).reshape(600, 800) % 255).astype(np.uint8)).convert("RGB")
    got = np.asarray(center_crop_arr(img, 128))
    # manual: 800x600 -> BOX halve while min >= 256: (400,300) -> (200,150)
    # -> scale 128/150 BICUBIC -> center crop
    ref = img.resize((400, 300), resample=Image.BOX)
    ref = ref.resize((200, 150), resample=Image.BOX)
    scale = 128 / 150
    ref = ref.resize((round(200 * scale), round(150 * scale)), resample=Image.BICUBIC)
    arr = np.array(ref)
    cy = (arr.shape[0] - 128) // 2
    cx = (arr.shape[1] - 128) // 2
    np.testing.assert_array_equal(got, arr[cy:cy + 128, cx:cx + 128])


def test_load_image_range_and_layout(tmp_path):
    p = str(tmp_path / "x.png")
    random_pil(300, 260).save(p)
    arr = load_image(p, 64)
    assert arr.shape == (3, 64, 64)
    assert arr.dtype == np.float32
    assert -1.0 <= arr.min() and arr.max() <= 1.0
    # hflip deterministic under seeded rng
    a = load_image(p, 64, hflip=True, rng=np.random.default_rng(3))
    b = load_image(p, 64, hflip=True, rng=np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)


def test_image_folder_index(tmp_path):
    for cls in ["n01440764", "n01443537", "a_first"]:
        os.makedirs(tmp_path / cls)
        for i in range(2):
            random_pil(32, 32, seed=i).save(str(tmp_path / cls / f"{i}.png"))
    idx = ImageFolderIndex(str(tmp_path))
    assert idx.classes == ["a_first", "n01440764", "n01443537"]  # sorted
    assert len(idx) == 6
    path, label = idx[0]
    assert label == 0 and path.endswith("0.png")


def make_feature_dirs(tmp_path, n=10):
    fdir, ldir = tmp_path / "feats", tmp_path / "labels"
    os.makedirs(fdir), os.makedirs(ldir)
    for i in range(n):
        np.save(str(fdir / f"{i}.npy"),
                np.full((1, 4, 8, 8), i, dtype=np.float32))
        np.save(str(ldir / f"{i}.npy"), np.array([i % 3]))
    return str(fdir), str(ldir)


def test_feature_dataset(tmp_path):
    fdir, ldir = make_feature_dirs(tmp_path)
    ds = FeatureDataset(fdir, ldir)
    assert len(ds) == 10
    f, l = ds[0]
    assert f.shape == (1, 4, 8, 8)


def test_feature_batches_shapes_and_epoch(tmp_path):
    fdir, ldir = make_feature_dirs(tmp_path)
    ds = FeatureDataset(fdir, ldir)
    batches = list(feature_batches(ds, 4, num_epochs=1, seed=0))
    assert len(batches) == 2  # 10 // 4, drop_last
    assert batches[0]["x"].shape == (4, 4, 8, 8)
    assert batches[0]["y"].shape == (4,)
    assert batches[0]["y"].dtype == np.int32


def test_feature_batches_process_sharding(tmp_path):
    """Two processes' shards must partition the epoch with no overlap."""
    fdir, ldir = make_feature_dirs(tmp_path, n=16)
    ds = FeatureDataset(fdir, ldir)
    seen = []
    for pi in range(2):
        for b in feature_batches(ds, 8, num_epochs=1, seed=0, shuffle=True,
                                 process_index=pi, process_count=2):
            assert b["x"].shape[0] == 4  # local batch = global/2
            seen.extend(b["x"][:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(16))


def test_synthetic_features():
    it = synthetic_features(8, latent_size=16)
    b = next(it)
    assert b["x"].shape == (8, 4, 16, 16)
    assert b["y"].shape == (8,)
    assert (b["y"] >= 0).all() and (b["y"] < 1000).all()


def test_to_uint8_matches_reference_quantization():
    """to_uint8 with (-1,1) == clamp(127.5x + 128) of sample_ddp.py:132
    (up to the 0.5-rounding convention)."""
    rs = np.random.RandomState(0)
    x = rs.randn(2, 3, 8, 8).astype(np.float32)
    got = to_uint8(x)
    expected = np.clip(127.5 * x + 127.5 + 0.5, 0, 255).astype(np.uint8).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, expected)


def test_make_grid_and_save(tmp_path):
    x = np.random.RandomState(0).randn(8, 3, 16, 16).astype(np.float32)
    grid = make_grid(x, nrow=4, padding=2)
    assert grid.shape == (2 * 16 + 3 * 2, 4 * 16 + 5 * 2, 3)
    p = str(tmp_path / "grid.png")
    save_image(x, p)
    img = Image.open(p)
    assert img.size == (4 * 16 + 5 * 2, 2 * 16 + 3 * 2)


def test_compilation_cache_helper(tmp_path, monkeypatch):
    """maybe_enable_compilation_cache: default dir, explicit dir, and the
    FDT_COMPILATION_CACHE=0 opt-out (CLIs call this on startup)."""
    import jax

    from fast_dit_tpu.utils.platform import maybe_enable_compilation_cache

    before = jax.config.jax_compilation_cache_dir
    try:
        monkeypatch.setenv("FDT_COMPILATION_CACHE", str(tmp_path / "xla"))
        maybe_enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
        assert (tmp_path / "xla").is_dir()

        monkeypatch.setenv("FDT_COMPILATION_CACHE", "0")
        jax.config.update("jax_compilation_cache_dir", None)
        maybe_enable_compilation_cache()  # opt-out: must not re-enable
        assert jax.config.jax_compilation_cache_dir is None
    finally:
        jax.config.update("jax_compilation_cache_dir", before)

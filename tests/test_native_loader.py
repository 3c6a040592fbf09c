"""Native C++ loader: builds from source, matches the Python loader's
batches exactly, and survives error paths."""

import os

import numpy as np
import pytest

pytest.importorskip("ctypes")

from fast_dit_tpu.data import FeatureDataset, feature_batches
from fast_dit_tpu.data.native_loader import (
    NativeFeatureLoader,
    build_native_library,
    native_available,
)


@pytest.fixture(scope="module")
def built():
    if not native_available():
        pytest.skip("no C++ toolchain")
    return build_native_library()


def make_dirs(tmp_path, n=12):
    fdir, ldir = str(tmp_path / "f"), str(tmp_path / "l")
    os.makedirs(fdir), os.makedirs(ldir)
    for i in range(n):
        np.save(f"{fdir}/{i}.npy", np.full((1, 4, 8, 8), i, np.float32))
        np.save(f"{ldir}/{i}.npy", np.array([i % 5]))  # int64
    return fdir, ldir


def test_build(built):
    assert os.path.exists(built)


def test_matches_python_loader(tmp_path, built):
    fdir, ldir = make_dirs(tmp_path)
    ds = FeatureDataset(fdir, ldir)
    py = list(feature_batches(ds, 4, shuffle=True, seed=3, num_epochs=2))
    nat = list(NativeFeatureLoader(fdir, ldir, 4, shuffle=True, seed=3,
                                   num_epochs=2))
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        np.testing.assert_array_equal(a["x"], b["x"])
        np.testing.assert_array_equal(a["y"], b["y"])


def test_process_sharding(tmp_path, built):
    fdir, ldir = make_dirs(tmp_path, n=16)
    seen = []
    for pi in range(2):
        for b in NativeFeatureLoader(fdir, ldir, 8, shuffle=True, seed=0,
                                     num_epochs=1, process_index=pi,
                                     process_count=2):
            assert b["x"].shape == (4, 4, 8, 8)
            seen.extend(b["x"][:, 0, 0, 0].astype(int).tolist())
    assert sorted(seen) == list(range(16))


def test_many_batches_threaded(tmp_path, built):
    fdir, ldir = make_dirs(tmp_path, n=64)
    batches = list(NativeFeatureLoader(fdir, ldir, 8, shuffle=False,
                                       num_epochs=1, num_threads=8, prefetch=2))
    assert len(batches) == 8
    # in-order delivery despite threading: first batch = first 8 files in
    # the (lexicographic, matching the reference's sorted-listdir) order
    expected = [int(s) for s in sorted(str(i) for i in range(64))[:8]]
    first = batches[0]["x"][:, 0, 0, 0].astype(int)
    np.testing.assert_array_equal(first, expected)


def test_corrupt_file_error(tmp_path, built):
    fdir, ldir = make_dirs(tmp_path, n=4)
    with open(f"{fdir}/0.npy", "wb") as f:
        f.write(b"not an npy file")
    with pytest.raises(RuntimeError, match="native loader"):
        list(NativeFeatureLoader(fdir, ldir, 2, shuffle=False, num_epochs=1))

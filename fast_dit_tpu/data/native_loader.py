"""ctypes bindings for the native C++ feature-batch loader.

Builds `native/dataloader.cc` on first use (g++, no external deps) and
exposes `NativeFeatureLoader`, a drop-in alternative to the Python
`feature_batches` iterator: a C++ thread pool parses npy files and assembles
batches with a bounded in-order prefetch queue — no GIL in the hot path.
Falls back cleanly (raises ImportError) when no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

from .features import FeatureDataset

__all__ = ["build_native_library", "NativeFeatureLoader", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SRC = os.path.join(_NATIVE_DIR, "dataloader.cc")
_SO = os.path.join(_NATIVE_DIR, "libfdt_dataloader.so")

_lib = None


def build_native_library(force: bool = False) -> str:
    """Compile the loader to native/libfdt_dataloader.so (cached)."""
    if not force and os.path.exists(_SO) and (
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return _SO
    cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = build_native_library()
    lib = ctypes.CDLL(so)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
    ]
    lib.dl_sample_shape.restype = ctypes.c_int
    lib.dl_sample_shape.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_int64), ctypes.c_int]
    lib.dl_num_batches.restype = ctypes.c_int64
    lib.dl_num_batches.argtypes = [ctypes.c_void_p]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float),
                            ctypes.POINTER(ctypes.c_int32),
                            ctypes.c_char_p, ctypes.c_int]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


class NativeFeatureLoader:
    """Iterate {"x": (B, C, H, W), "y": (B,)} batches from npy pairs via the
    C++ loader. Same sharding/shuffle semantics as `feature_batches`."""

    def __init__(self, features_dir: str, labels_dir: str, batch_size: int, *,
                 shuffle: bool = True, seed: int = 0, num_epochs: Optional[int] = 1,
                 process_index: int = 0, process_count: int = 1,
                 prefetch: int = 4, num_threads: int = 8):
        self._lib = _load_lib()
        ds = FeatureDataset(features_dir, labels_dir)
        self._fpaths = [os.path.join(features_dir, f).encode()
                        for f in ds.features_files]
        self._lpaths = [os.path.join(labels_dir, f).encode()
                        for f in ds.labels_files]
        assert batch_size % process_count == 0
        self.local_bs = batch_size // process_count
        self.n = len(ds)
        self.shuffle = shuffle
        self.seed = seed
        self.num_epochs = num_epochs
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.num_threads = num_threads

    def _epoch_order(self, epoch: int) -> np.ndarray:
        order = np.arange(self.n, dtype=np.int64)
        if self.shuffle:
            order = np.random.RandomState(self.seed + epoch).permutation(self.n).astype(np.int64)
        local = order[self.process_index::self.process_count]
        usable = (len(local) // self.local_bs) * self.local_bs
        return np.ascontiguousarray(local[:usable])

    def __iter__(self) -> Iterator[dict]:
        lib = self._lib
        n_files = len(self._fpaths)
        FArr = ctypes.c_char_p * n_files
        fp = FArr(*self._fpaths)
        lp = FArr(*self._lpaths)
        err = ctypes.create_string_buffer(512)
        epoch = 0
        while self.num_epochs is None or epoch < self.num_epochs:
            order = self._epoch_order(epoch)
            handle = lib.dl_create(
                fp, lp, n_files,
                order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(order),
                self.local_bs, self.prefetch, self.num_threads, err, 512)
            if not handle:
                raise RuntimeError(f"native loader init failed: {err.value.decode()}")
            try:
                shp = (ctypes.c_int64 * 8)()
                ndim = lib.dl_sample_shape(handle, shp, 8)
                sample_shape = tuple(int(shp[i]) for i in range(ndim))
                # features stored (1, C, H, W): squeeze the leading 1
                if sample_shape[0] == 1:
                    sample_shape = sample_shape[1:]
                x = np.empty((self.local_bs, *sample_shape), np.float32)
                y = np.empty((self.local_bs,), np.int32)
                while True:
                    rc = lib.dl_next(
                        handle,
                        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        y.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        err, 512)
                    if rc == 0:
                        break
                    if rc < 0:
                        raise RuntimeError(f"native loader: {err.value.decode()}")
                    yield {"x": x.copy(), "y": y.copy()}
            finally:
                lib.dl_destroy(handle)
            epoch += 1

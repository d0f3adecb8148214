"""ctypes bindings for the native (C++) decode/resize/prefetch loader.

Builds native/loader.cpp on first use (g++, cached next to the source) and
exposes the same batch dict interface as data.datasets.Loader. Falls back
gracefully if the toolchain or libjpeg/libpng are unavailable —
`available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Iterator

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SO_PATH = _NATIVE_DIR / "libryloader.so"
_lib = None
_build_error: str | None = None


def _build() -> Path | None:
    global _build_error
    src = _NATIVE_DIR / "loader.cpp"
    if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
        return _SO_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_SO_PATH),
           "-ljpeg", "-lpng", "-lpthread", "-std=c++17"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        return _SO_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        _build_error = getattr(e, "stderr", str(e)) or str(e)
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(str(so))
    lib.ryt_create.restype = ctypes.c_void_p
    lib.ryt_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                               ctypes.c_int, ctypes.c_int, ctypes.c_int,
                               ctypes.c_uint64, ctypes.c_int]
    lib.ryt_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ryt_start_epoch_order.argtypes = [ctypes.c_void_p,
                                          ctypes.c_void_p, ctypes.c_int]
    lib.ryt_next.restype = ctypes.c_int
    lib.ryt_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_int)]
    lib.ryt_num_batches.restype = ctypes.c_int
    lib.ryt_num_batches.argtypes = [ctypes.c_void_p]
    lib.ryt_destroy.argtypes = [ctypes.c_void_p]
    lib.ryt_load_one.restype = ctypes.c_int
    lib.ryt_load_one.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                 ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_int),
                                 ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def load_one(path: str, img_size: int):
    """Decode+resize+pad one image natively.
    -> (canvas (S,S,3) uint8, hw (2,) float32, (h0, w0)) or None."""
    lib = _load()
    if lib is None:
        return None
    canvas = np.empty((img_size, img_size, 3), np.uint8)
    hw = np.empty((2,), np.float32)
    h0 = ctypes.c_int()
    w0 = ctypes.c_int()
    ok = lib.ryt_load_one(path.encode(), img_size,
                          canvas.ctypes.data_as(ctypes.c_void_p),
                          hw.ctypes.data_as(ctypes.c_void_p),
                          ctypes.byref(h0), ctypes.byref(w0))
    if not ok:
        return None
    return canvas, hw, (h0.value, w0.value)


class NativeLoader:
    """Batch iterator backed by the C++ prefetcher. Labels/masks are padded
    on the Python side from the dataset's parsed label arrays.

    Same epoch semantics as data.datasets.Loader (so the two are
    interchangeable in the train CLI): the per-epoch index order —
    seeded shuffle, image-weight resampling (reference train.py:324-335),
    shard slicing (reference utils/datasets.py:82 DistributedSampler) —
    is computed in Python with the IDENTICAL rng calls, then handed to
    the C++ prefetcher as an explicit order. Cached datasets
    (--cache-images ram/disk) serve batches by direct gather — the
    decode the C++ threads would parallelize is already paid."""

    def __init__(self, ds, batch_size: int, shuffle: bool = True,
                 seed: int = 0, n_threads: int | None = None,
                 shard_index: int = 0, num_shards: int = 1):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native loader unavailable: {_build_error}")
        self.lib = lib
        self.ds = ds
        self.bs = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        n_threads = n_threads or min(8, os.cpu_count() or 1)
        arr = (ctypes.c_char_p * len(ds.img_files))(
            *[f.encode() for f in ds.img_files])
        self.handle = lib.ryt_create(arr, len(ds.img_files), ds.img_size,
                                     batch_size, n_threads, seed,
                                     1 if shuffle else 0)
        # label tensors are precomputed once (small)
        M = ds.max_labels
        n = len(ds.img_files)
        self.all_labels = np.zeros((n, M, 5), np.float32)
        self.all_masks = np.zeros((n, M), bool)
        for i, l in enumerate(ds.labels):
            k = min(len(l), M)
            self.all_labels[i, :k] = l[:k]
            self.all_masks[i, :k] = True

    def _epoch_order(self, epoch: int,
                     image_weights: "np.ndarray | None") -> np.ndarray:
        """Identical policy (and rng stream) to Loader.epoch."""
        if image_weights is not None:
            w = np.asarray(image_weights, np.float64)
            if w.sum() <= 0:
                w = np.ones_like(w)
            w = w / w.sum()
            idx = np.random.default_rng(self.seed + epoch).choice(
                len(self.ds), size=len(self.ds), replace=True, p=w)
        else:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx[self.shard_index::self.num_shards]

    def __len__(self) -> int:
        n = -(-len(self.ds) // self.num_shards)   # ceil per-shard items
        return -(-n // self.bs)                   # partial tail included

    def epoch(self, epoch: int = 0,
              image_weights: "np.ndarray | None" = None) -> Iterator[dict]:
        idx = np.ascontiguousarray(
            self._epoch_order(epoch, image_weights), np.int32)
        if getattr(self.ds, "_cache_mode", None) is not None:
            yield from self._epoch_cached(idx)
            return
        self.lib.ryt_start_epoch_order(
            self.handle, idx.ctypes.data_as(ctypes.c_void_p), len(idx))
        S = self.ds.img_size
        while True:
            images = np.empty((self.bs, S, S, 3), np.uint8)
            hw = np.empty((self.bs, 2), np.float32)
            indices = np.empty((self.bs,), np.int32)
            count = ctypes.c_int()
            ok = self.lib.ryt_next(
                self.handle, images.ctypes.data_as(ctypes.c_void_p),
                hw.ctypes.data_as(ctypes.c_void_p),
                indices.ctypes.data_as(ctypes.c_void_p), ctypes.byref(count))
            if not ok:
                break
            idx_b = np.clip(indices, 0, len(self.ds.img_files) - 1)
            yield dict(images=images, hw=hw,
                       labels=self.all_labels[idx_b],
                       mask=self.all_masks[idx_b]
                       & (np.arange(self.bs) < count.value)[:, None],
                       indices=indices)

    def _epoch_cached(self, idx: np.ndarray) -> Iterator[dict]:
        """Pre-decoded dataset: batches are pure gathers (pads the tail
        batch with masked slots, matching the C++ path's partial batch)."""
        S = self.ds.img_size
        for b0 in range(0, len(idx), self.bs):
            sel = idx[b0:b0 + self.bs]
            n = len(sel)
            images = np.full((self.bs, S, S, 3), 114, np.uint8)
            hw = np.zeros((self.bs, 2), np.float32)
            indices = np.full((self.bs,), -1, np.int32)
            for j, i in enumerate(sel):
                canvas, chw, _, _, _ = self.ds.load_item(int(i))
                images[j], hw[j], indices[j] = canvas, chw, i
            idx_b = np.clip(indices, 0, len(self.ds.img_files) - 1)
            yield dict(images=images, hw=hw,
                       labels=self.all_labels[idx_b],
                       mask=self.all_masks[idx_b]
                       & (np.arange(self.bs) < n)[:, None],
                       indices=indices)

    def close(self):
        if self.handle:
            self.lib.ryt_destroy(self.handle)
            self.handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

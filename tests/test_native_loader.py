"""Native (C++) loader: build, decode parity, batch iteration."""

import numpy as np
import pytest

from rep_yolo_tpu.data import native_loader as nl
from rep_yolo_tpu.data.datasets import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_ds")
    return make_synthetic_dataset(10, img_size=128, root=root)


def test_native_build_and_load_one(ds):
    if not nl.available():
        pytest.skip(f"native loader unavailable: {nl.build_error()}")
    out = nl.load_one(ds.img_files[0], 128)
    assert out is not None
    canvas, hw, (h0, w0) = out
    ref_canvas, ref_hw, *_ = ds.load_item(0)
    np.testing.assert_array_equal(hw, ref_hw)
    # pad region must be exactly 114
    h, w = int(hw[0]), int(hw[1])
    assert (canvas[h:] == 114).all() and (canvas[:, w:] == 114).all()
    # content approximates the cv2 reference resize (different area kernel)
    diff = np.abs(canvas[:h, :w].astype(int) - ref_canvas[:h, :w].astype(int))
    assert diff.mean() < 10


def test_native_batch_iteration(ds):
    if not nl.available():
        pytest.skip("native loader unavailable")
    loader = nl.NativeLoader(ds, batch_size=4, shuffle=True, seed=1)
    seen = []
    for b in loader.epoch(0):
        assert b["images"].shape == (4, 128, 128, 3)
        assert b["labels"].shape == (4, ds.max_labels, 5)
        seen.extend(int(i) for i in b["indices"] if i >= 0)
    assert sorted(seen) == list(range(10))
    # second epoch shuffles differently but covers everything
    seen2 = [int(i) for b in loader.epoch(1) for i in b["indices"] if i >= 0]
    assert sorted(seen2) == list(range(10))
    assert seen2 != seen
    loader.close()


def test_native_sharded_epoch_matches_python_loader(ds):
    """Two shards cover the epoch's index set exactly once, with the
    SAME per-shard order as the Python Loader (interchangeability —
    reference DistributedSampler, utils/datasets.py:82)."""
    if not nl.available():
        pytest.skip("native loader unavailable")
    from rep_yolo_tpu.data.datasets import Loader

    got = {}
    for shard in (0, 1):
        loader = nl.NativeLoader(ds, batch_size=2, shuffle=True, seed=3,
                                 shard_index=shard, num_shards=2)
        got[shard] = [int(i) for b in loader.epoch(0)
                      for i in b["indices"] if i >= 0]
        ref = Loader(ds, 2, shuffle=True, seed=3, drop_last=False,
                     shard_index=shard, num_shards=2)
        ref_idx = [int(i) for b in ref.epoch(0) for i in b["indices"]]
        assert got[shard] == ref_idx, (shard, got[shard], ref_idx)
        loader.close()
    assert sorted(got[0] + got[1]) == list(range(10))
    assert not set(got[0]) & set(got[1])


def test_native_image_weights_epoch(ds):
    """Weighted resampling draws (with replacement) follow the weights
    and match the Python Loader's rng stream (reference train.py:324-335)."""
    if not nl.available():
        pytest.skip("native loader unavailable")
    from rep_yolo_tpu.data.datasets import Loader

    w = np.zeros(10)
    w[3] = 1.0   # degenerate weights: every draw must be image 3
    loader = nl.NativeLoader(ds, batch_size=4, shuffle=True, seed=5)
    idx = [int(i) for b in loader.epoch(0, image_weights=w)
           for i in b["indices"] if i >= 0]
    assert idx == [3] * 10
    # non-degenerate: identical draw sequence as the Python loader
    w = np.arange(10, dtype=np.float64) + 1
    idx = [int(i) for b in loader.epoch(2, image_weights=w)
           for i in b["indices"] if i >= 0]
    ref = Loader(ds, 4, shuffle=True, seed=5, drop_last=False)
    ref_idx = [int(i) for b in ref.epoch(2, image_weights=w)
               for i in b["indices"]]
    assert idx == ref_idx
    loader.close()


def test_native_cached_epoch(ds):
    """A RAM-cached dataset serves by gather with identical batch dict
    semantics (canvases equal to load_item's, same order policy)."""
    if not nl.available():
        pytest.skip("native loader unavailable")
    ds.cache_images("ram")
    try:
        loader = nl.NativeLoader(ds, batch_size=4, shuffle=True, seed=1)
        seen = []
        for b in loader.epoch(0):
            assert b["images"].shape == (4, 128, 128, 3)
            for j, i in enumerate(b["indices"]):
                if i < 0:
                    continue
                canvas, hw, *_ = ds.load_item(int(i))
                np.testing.assert_array_equal(b["images"][j], canvas)
                np.testing.assert_array_equal(b["hw"][j], hw)
                seen.append(int(i))
        assert sorted(seen) == list(range(10))
        loader.close()
    finally:
        ds._cache_mode = None

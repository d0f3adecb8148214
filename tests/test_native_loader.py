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

"""Autoanchor: BPR check, k-means + genetic evolution, and the model
anchor-swap used by the training CLI (reference train.py:285 ->
utils/autoanchor.py:23-59)."""

import numpy as np
import pytest

from rep_yolo_tpu.utils.autoanchor import check_anchors, kmean_anchors


def _synth_ds(tmp_path, n=12, img_size=64, box_scale=(0.08, 0.4), seed=0):
    from rep_yolo_tpu.data.datasets import make_synthetic_dataset

    return make_synthetic_dataset(n, img_size, nc=1, max_labels=16,
                                  seed=seed, root=tmp_path / "ds")


def test_check_anchors_good_fit(tmp_path):
    ds = _synth_ds(tmp_path)
    # anchors spanning the synthetic box range (0.08-0.4 of 64px content)
    anchors = np.asarray([[[6, 6], [10, 10], [14, 14]],
                          [[16, 16], [20, 20], [24, 24]],
                          [[26, 26], [30, 30], [34, 34]]], np.float32)
    bpr, new = check_anchors(ds, anchors, img_size=64, thr=4.0)
    assert bpr >= 0.98
    assert new is None


def test_check_anchors_bad_fit_evolves(tmp_path):
    ds = _synth_ds(tmp_path)
    # absurd anchors (100x too large): BPR < 0.98 triggers re-evolution
    anchors = np.full((3, 3, 2), 2000.0, np.float32)
    bpr, new = check_anchors(ds, anchors, img_size=64, thr=4.0)
    assert bpr < 0.98
    assert new is not None and new.shape == (9, 2)
    # evolved anchors must fit strictly better
    bpr2, _ = check_anchors(ds, new.reshape(3, 3, 2), img_size=64, thr=4.0)
    assert bpr2 > bpr


def test_kmean_anchors_sorted_by_area(tmp_path):
    ds = _synth_ds(tmp_path)
    k = kmean_anchors(ds, n=6, img_size=64, gen=50)
    areas = k.prod(1)
    assert (np.diff(areas) >= 0).all()
    assert (k >= 2.0 - 1e-6).all()


def test_model_with_anchors_rebuilds_grids():
    from rep_yolo_tpu.models.model import RepYOLO

    m = RepYOLO.from_config("cfg/rep_yolo_tiny_test.yaml")
    nl, na = m.cfg.nl, m.cfg.na
    flat = np.asarray([[4 + i, 5 + i] for i in range(nl * na)], np.float32)
    m2 = m.with_anchors(flat)
    assert m2.anchors_px.shape == (nl, na, 2)
    # grid = px / stride per level
    for i, s in enumerate(m2.strides):
        np.testing.assert_allclose(m2.anchors_grid[i],
                                   m2.anchors_px[i] / s, rtol=1e-6)
    # ascending-area anchors must land on ascending strides
    areas = m2.anchors_px.prod(-1).mean(-1)
    assert (np.diff(areas) >= 0).all() == (np.diff(m2.strides) >= 0).all()
    # params are untouched views
    assert m2.net is m.net


def test_descending_anchor_cfg_flips_order():
    """check_anchor_order flip (round-2 verdict minor #7): a cfg whose
    anchors are area-descending while strides ascend must come out
    flipped so level i anchors match stride i."""
    from rep_yolo_tpu.models.model import RepYOLO

    m = RepYOLO.from_config("cfg/rep_yolo_tiny_test.yaml")
    desc = m.anchors_px[::-1].reshape(-1, 2)   # big anchors first
    m2 = m.with_anchors(desc)
    areas = m2.anchors_px.prod(-1).mean(-1)
    strides = np.asarray(m2.strides)
    assert ((np.diff(areas) >= 0).all() and (np.diff(strides) >= 0).all()) \
        or ((np.diff(areas) <= 0).all() and (np.diff(strides) <= 0).all())

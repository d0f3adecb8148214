"""Box math unit tests (formula-level, no fixtures needed)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.ops import boxes as B


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xywh = np.abs(rng.normal(size=(17, 4))).astype(np.float32) + 0.1
    out = B.xyxy2xywh(B.xywh2xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(out, xywh, rtol=1e-6, atol=1e-6)


def test_box_iou_known_values():
    a = jnp.asarray([[0, 0, 10, 10], [0, 0, 4, 4]], jnp.float32)
    b = jnp.asarray([[5, 5, 15, 15], [0, 0, 10, 10]], jnp.float32)
    iou = B.box_iou(a, b)
    np.testing.assert_allclose(iou[0, 0], 25 / 175, rtol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(iou[1, 1], 16 / 100, rtol=1e-6)


def test_bbox_iou_ciou_matches_manual():
    # identical boxes -> CIoU ~ 1 (minus the reference's +eps shift)
    box = jnp.asarray([5.0, 5.0, 4.0, 2.0])
    v = B.bbox_iou(box, box, xywh=True, CIoU=True)
    assert abs(float(v) - 1.0) < 1e-3
    # disjoint boxes -> CIoU < 0 (distance penalty)
    b2 = jnp.asarray([50.0, 50.0, 4.0, 2.0])
    assert float(B.bbox_iou(box, b2, xywh=True, CIoU=True)) < 0


def test_scale_coords_letterbox_roundtrip():
    # 640x640 letterboxed from a 480x640 original: gain=1.0, pad=(0, 80)
    coords = jnp.asarray([[10.0, 90.0, 100.0, 200.0]])
    out = B.scale_coords((640, 640), coords, (480, 640))
    np.testing.assert_allclose(out, [[10.0, 10.0, 100.0, 120.0]], atol=1e-5)


def test_clip_coords():
    c = jnp.asarray([[-5.0, -3.0, 700.0, 500.0]])
    out = B.clip_coords(c, (480, 640))
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 480.0]])

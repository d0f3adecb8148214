"""NMS parity vs a pure-numpy exact greedy reference (the same algorithm
torchvision.ops.nms implements: score-descending greedy suppression)."""
import pytest

import jax.numpy as jnp
import numpy as np

from rep_yolo_tpu.ops.nms import non_max_suppression, detections_to_numpy, MAX_WH


def np_greedy_nms(boxes, scores, iou_thres):
    """Exact greedy NMS, index order = torchvision."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        a1 = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / (a1 + a2 - inter)
        suppressed |= iou > iou_thres
    return keep


def np_reference_nms(pred, conf_thres, iou_thres, nc, multi_label=False,
                     max_det=300):
    """Full reference non_max_suppression semantics in numpy
    (reference utils/general.py:953-1045) for one image."""
    obj = pred[:, 4]
    x = pred[obj > conf_thres]
    if nc == 1:
        scores_mat = np.repeat(x[:, 4:5], 1, 1)
    else:
        scores_mat = x[:, 5:] * x[:, 4:5]
    box = np.stack([x[:, 0] - x[:, 2] / 2, x[:, 1] - x[:, 3] / 2,
                    x[:, 0] + x[:, 2] / 2, x[:, 1] + x[:, 3] / 2], 1)
    if multi_label and nc > 1:
        i, j = np.nonzero(scores_mat > conf_thres)
        boxes, scores, cls = box[i], scores_mat[i, j], j.astype(np.float32)
    else:
        conf = scores_mat.max(1)
        j = scores_mat.argmax(1)
        m = conf > conf_thres
        boxes, scores, cls = box[m], conf[m], j[m].astype(np.float32)
    if len(boxes) == 0:
        return np.zeros((0, 6), np.float32)
    offset = cls * MAX_WH
    keep = np_greedy_nms(boxes + offset[:, None], scores, iou_thres)[:max_det]
    return np.concatenate([boxes[keep], scores[keep, None],
                           cls[keep, None]], 1)


def _rand_pred(rng, n, nc):
    xy = rng.uniform(50, 600, (n, 2))
    wh = rng.uniform(10, 120, (n, 2))
    obj = rng.uniform(0, 1, (n, 1))
    cls = rng.uniform(0, 1, (n, nc))
    return np.concatenate([xy, wh, obj, cls], 1).astype(np.float32)


def test_nms_single_class_matches_numpy():
    rng = np.random.default_rng(3)
    pred = _rand_pred(rng, 400, 1)[None]
    det = non_max_suppression(jnp.asarray(pred), 0.25, 0.45, max_nms=512)
    ours = detections_to_numpy(det)[0]
    ref = np_reference_nms(pred[0], 0.25, 0.45, nc=1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours[:, :5], ref[:, :5], rtol=1e-5, atol=1e-4)
    np.testing.assert_array_equal(ours[:, 5], ref[:, 5])


def test_nms_multiclass_best_class():
    rng = np.random.default_rng(4)
    pred = _rand_pred(rng, 300, 7)[None]
    det = non_max_suppression(jnp.asarray(pred), 0.2, 0.5, max_nms=512, nc=7)
    ours = detections_to_numpy(det)[0]
    ref = np_reference_nms(pred[0], 0.2, 0.5, nc=7)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours[:, :5], ref[:, :5], rtol=1e-5, atol=1e-4)


def test_nms_multilabel():
    rng = np.random.default_rng(5)
    pred = _rand_pred(rng, 200, 4)[None]
    det = non_max_suppression(jnp.asarray(pred), 0.1, 0.65, max_nms=1024,
                              nc=4, multi_label=True)
    ours = detections_to_numpy(det)[0]
    ref = np_reference_nms(pred[0], 0.1, 0.65, nc=4, multi_label=True)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(
        np.sort(ours[:, 4])[::-1], np.sort(ref[:, 4])[::-1],
        rtol=1e-5, atol=1e-5)


def _chain_pred(n=64):
    """Boxes forming a long suppression chain: box i overlaps i+1 with
    IoU ~0.6 and scores strictly decreasing — greedy keeps every other
    box, so a naive one-sweep 'suppress all overlapped' is wrong and the
    fixed-point solver needs ~n/2 sweeps. Exercises convergence depth."""
    xs = 50.0 + 8.0 * np.arange(n)
    boxes = np.stack([xs, np.full(n, 50.0), np.full(n, 32.0),
                      np.full(n, 32.0)], 1)
    obj = np.linspace(0.95, 0.35, n)[:, None]
    return np.concatenate([boxes, obj, np.ones((n, 1))],
                          1).astype(np.float32)[None]


@pytest.mark.slow
def test_nms_methods_agree():
    """pallas (interpret on CPU), matrix-XLA and greedy backends produce
    identical detections, incl. on deep suppression chains."""
    rng = np.random.default_rng(11)
    cases = [
        (_rand_pred(rng, 400, 1)[None], dict(nc=1)),
        (_rand_pred(rng, 300, 7)[None], dict(nc=7)),
        (_chain_pred(64), dict(nc=1)),
    ]
    for pred, kw in cases:
        pred_j = jnp.asarray(pred)
        outs = {}
        for method in ("greedy", "matrix", "pallas"):
            det = non_max_suppression(pred_j, 0.25, 0.45, max_nms=512,
                                      method=method, **kw)
            outs[method] = detections_to_numpy(det)[0]
        for method in ("matrix", "pallas"):
            np.testing.assert_allclose(outs[method], outs["greedy"],
                                       rtol=1e-6, atol=1e-6,
                                       err_msg=method)


def test_nms_chain_matches_numpy():
    pred = _chain_pred(48)
    det = non_max_suppression(jnp.asarray(pred), 0.25, 0.45, max_nms=128,
                              method="matrix")
    ours = detections_to_numpy(det)[0]
    ref = np_reference_nms(pred[0], 0.25, 0.45, nc=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_nms_merge_weighted_mean():
    """merge-NMS: kept boxes become score-weighted means of overlapping
    candidates (reference utils/general.py:1032-1037)."""
    # two heavily-overlapping boxes -> one kept, merged between the two
    pred = np.zeros((1, 2, 6), np.float32)
    pred[0, 0] = [100, 100, 40, 40, 0.9, 1.0]
    pred[0, 1] = [104, 104, 40, 40, 0.6, 1.0]
    det_plain = non_max_suppression(jnp.asarray(pred), 0.25, 0.45,
                                    max_nms=64, method="matrix")
    det_merge = non_max_suppression(jnp.asarray(pred), 0.25, 0.45,
                                    max_nms=64, method="matrix", merge=True)
    assert int(det_plain.count[0]) == int(det_merge.count[0]) == 1
    b_plain = np.asarray(det_plain.boxes[0, 0])
    b_merge = np.asarray(det_merge.boxes[0, 0])
    # plain keeps the top box exactly; merged shifts toward the second
    np.testing.assert_allclose(b_plain, [80, 80, 120, 120], atol=1e-4)
    expected = (0.9 * np.array([80, 80, 120, 120])
                + 0.6 * np.array([84, 84, 124, 124])) / 1.5
    np.testing.assert_allclose(b_merge, expected, atol=1e-3)


def test_nms_batched_and_empty():
    rng = np.random.default_rng(6)
    pred = np.stack([_rand_pred(rng, 100, 1),
                     np.zeros((100, 6), np.float32)])
    det = non_max_suppression(jnp.asarray(pred), 0.25, 0.45, max_nms=128)
    outs = detections_to_numpy(det)
    assert len(outs) == 2
    assert outs[1].shape[0] == 0
    assert int(det.count[1]) == 0

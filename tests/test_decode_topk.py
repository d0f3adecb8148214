"""Parity of the serving-path top-k decode vs the exact decode + NMS.

decode_topk ranks raw objectness logits before decoding; for nc==1
(score == obj, reference utils/general.py:994-996) this selects exactly
the candidate set the full decode hands to NMS, so the final detections
must match. Decode semantics: reference models/yolo.py:129-130.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.models.model import RepYOLO
from rep_yolo_tpu.ops.nms import non_max_suppression


@pytest.fixture(scope="module")
def tiny():
    model = RepYOLO.from_config("cfg/rep_yolo_tiny_test.yaml")
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    return model, variables


def test_predict_topk_matches_predict_nms(tiny):
    model, variables = tiny
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))

    pred = model.predict(variables, x)
    ref = non_max_suppression(pred.astype(jnp.float32), 0.003, 0.45,
                              max_nms=256)
    fast = model.predict_topk(variables, x, k=256)
    out = non_max_suppression(fast, 0.003, 0.45, max_nms=256)

    assert int(out.count.sum()) > 0, "degenerate test: no detections"
    np.testing.assert_array_equal(np.asarray(ref.count),
                                  np.asarray(out.count))
    for b in range(2):
        n = int(ref.count[b])
        # same detections; candidate order may differ within score ties,
        # so compare score-sorted rows
        rs = np.argsort(-np.asarray(ref.scores[b][:n]), kind="stable")
        os_ = np.argsort(-np.asarray(out.scores[b][:n]), kind="stable")
        np.testing.assert_allclose(np.asarray(ref.scores[b][:n])[rs],
                                   np.asarray(out.scores[b][:n])[os_],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref.boxes[b][:n])[rs],
                                   np.asarray(out.boxes[b][:n])[os_],
                                   rtol=1e-4, atol=1e-3)


def test_decode_topk_rows_match_exact_decode(tiny):
    """Every decoded top-k row equals the corresponding exact-decode row
    (same box/obj up to f32-vs-map-dtype), independent of NMS."""
    model, variables = tiny
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    exact = np.asarray(model.predict(variables, x)[0], np.float32)
    fast = np.asarray(model.predict_topk(variables, x, k=64)[0])
    # match rows by nearest box center: each fast row must exist in exact
    for row in fast:
        d = np.abs(exact - row[None]).sum(1)
        assert d.min() < 1e-3, (row, exact[d.argmin()])


def test_gated_presorted_nms_matches_exact(tiny):
    """Serving fast path: decode_topk(conf_thres=) applies the objectness
    gate at the logit level (sigmoid(t) > c <=> t > logit(c), exact) and
    non_max_suppression(presorted=True) skips its own full-set top_k —
    detections must match the exact path bit-for-bit up to tie order.
    Reference semantics: utils/general.py:962 (conf gate), :994-996
    (nc==1 score shortcut)."""
    model, variables = tiny
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))

    pred = model.predict(variables, x)
    ref = non_max_suppression(pred.astype(jnp.float32), 0.003, 0.45,
                              max_nms=256)
    fast = model.predict_topk(variables, x, k=256, conf_thres=0.003)
    out = non_max_suppression(fast, 0.003, 0.45, presorted=True)

    assert int(out.count.sum()) > 0, "degenerate test: no detections"
    np.testing.assert_array_equal(np.asarray(ref.count),
                                  np.asarray(out.count))
    for b in range(2):
        n = int(ref.count[b])
        rs = np.argsort(-np.asarray(ref.scores[b][:n]), kind="stable")
        os_ = np.argsort(-np.asarray(out.scores[b][:n]), kind="stable")
        np.testing.assert_allclose(np.asarray(ref.scores[b][:n])[rs],
                                   np.asarray(out.scores[b][:n])[os_],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(ref.boxes[b][:n])[rs],
                                   np.asarray(out.boxes[b][:n])[os_],
                                   rtol=1e-4, atol=1e-3)


def test_presorted_requires_single_class():
    import pytest as _pytest

    pred = jnp.zeros((1, 8, 7))  # nc == 2
    with _pytest.raises(ValueError):
        non_max_suppression(pred, 0.25, 0.45, presorted=True)

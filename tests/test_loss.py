"""Loss parity vs the reference's ComputeLoss / ComputeLossOTA on canned
raw maps + targets (fixtures from tools/gen_goldens.py gen_losses)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.train.loss import LossConfig, compute_loss, compute_loss_ota
from tests.conftest import load_golden

M = 8  # padded targets per image


def _unpack(golden_dir):
    g = load_golden("loss_io")
    # reference maps are (bs,na,h,w,no); ours are (b,h,w,na,no)
    preds = [jnp.asarray(g[f"p{i}"].transpose(0, 2, 3, 1, 4))
             for i in range(3)]
    bs = preds[0].shape[0]
    tgt = g["targets"]
    labels = np.zeros((bs, M, 5), np.float32)
    mask = np.zeros((bs, M), bool)
    counts = [0] * bs
    for row in tgt:
        b = int(row[0])
        labels[b, counts[b]] = row[1:]
        mask[b, counts[b]] = True
        counts[b] += 1
    cfg = LossConfig(nc=1, box_gain=0.05, obj_gain=0.7, cls_gain=0.3,
                     anchor_t=4.0, gr=1.0)
    return (preds, jnp.asarray(labels), jnp.asarray(mask),
            g["anchors_norm"], g["strides"], int(g["img_size"]), g, cfg)


@pytest.mark.slow
def test_classic_loss_matches_reference(golden_dir):
    preds, labels, mask, anchors, strides, size, g, cfg = _unpack(golden_dir)
    loss, comps = compute_loss(preds, labels, mask, anchors, cfg)
    ref = g["items"]  # [box, obj, cls, total]
    np.testing.assert_allclose(float(comps["box"]), ref[0], rtol=2e-4)
    np.testing.assert_allclose(float(comps["obj"]), ref[1], rtol=2e-4)
    np.testing.assert_allclose(float(comps["cls"]), ref[2], atol=1e-7)
    np.testing.assert_allclose(float(loss), float(g["loss"][0]), rtol=2e-4)


@pytest.mark.slow
def test_ota_loss_matches_reference(golden_dir):
    preds, labels, mask, anchors, strides, size, g, cfg = _unpack(golden_dir)
    loss, comps = compute_loss_ota(preds, labels, mask, anchors,
                                   tuple(float(s) for s in strides),
                                   size, cfg)
    ref = g["items_ota"]
    np.testing.assert_allclose(float(comps["box"]), ref[0], rtol=5e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(comps["obj"]), ref[1], rtol=5e-4)
    np.testing.assert_allclose(float(comps["cls"]), ref[2], atol=1e-7)
    np.testing.assert_allclose(float(loss), float(g["loss_ota"][0]),
                               rtol=5e-4)


def test_aux_ota_loss_matches_reference(golden_dir):
    from rep_yolo_tpu.train.loss import compute_loss_aux_ota

    preds, labels, mask, anchors, strides, size, g, cfg = _unpack(golden_dir)
    preds_aux = [jnp.asarray(g[f"paux{i}"].transpose(0, 2, 3, 1, 4))
                 for i in range(6)]
    loss, comps = compute_loss_aux_ota(
        preds_aux, labels, mask, anchors,
        tuple(float(s) for s in strides), size, cfg)
    ref = g["items_aux"]
    np.testing.assert_allclose(float(comps["box"]), ref[0], rtol=5e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(comps["obj"]), ref[1], rtol=5e-4)
    np.testing.assert_allclose(float(loss), float(g["loss_aux"][0]),
                               rtol=5e-4)


def test_loss_no_targets(golden_dir):
    """Empty target mask must yield zero box/cls loss and finite obj loss."""
    preds, labels, mask, anchors, strides, size, g, cfg = _unpack(golden_dir)
    mask0 = jnp.zeros_like(mask)
    loss, comps = compute_loss(preds, labels, mask0, anchors, cfg)
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(comps["box"]), 0.0, atol=1e-6)


def test_topk_iter_matches_lax_top_k():
    """_topk_iter is a drop-in for lax.top_k (same values, same indices,
    same lowest-index tie-break) — the simOTA selection depends on exact
    rank semantics (reference utils/loss.py:749-751)."""
    import numpy as np

    from rep_yolo_tpu.train.loss import _topk_iter

    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 7, 111)).astype(np.float32)
    x[..., :5] = 0.25          # ties
    x[0, 0, :] = 0.0           # constant row
    v1, i1 = jax.lax.top_k(jnp.asarray(x), 10)
    v2, i2 = _topk_iter(jnp.asarray(x), 10)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

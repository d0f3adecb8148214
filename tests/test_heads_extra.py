"""IBin / IKeypoint heads, SigmoidBin encoding, and the Bin OTA loss."""
import pytest

import jax
import jax.numpy as jnp
import numpy as np

from rep_yolo_tpu.models.heads import (
    IBin, IKeypoint, decode_level_bin, decode_level_kpt)
from rep_yolo_tpu.ops.sigmoid_bin import SigmoidBinSpec
from rep_yolo_tpu.train.loss import LossConfig, compute_loss_bin_ota

ANCHORS = ((10, 13, 16, 30, 33, 23),)


def test_sigmoid_bin_roundtrip():
    """Encoded targets decode back within one bin step."""
    spec = SigmoidBinSpec(bin_count=21, vmin=0.0, vmax=4.0)
    assert spec.length == 22
    targets = jnp.asarray([0.1, 0.5, 1.0, 2.0, 3.7])
    # perfect logits: residual 0.5 (sigmoid=0.5 -> reg=0), huge on true bin
    bins = spec.bins()
    idx = jnp.argmin(jnp.abs(targets[:, None] - bins), -1)
    logits = jnp.full((5, spec.length), -20.0)
    logits = logits.at[:, 0].set(0.0)
    logits = logits.at[jnp.arange(5), idx + 1].set(20.0)
    dec = spec.forward(jax.nn.sigmoid(logits))
    np.testing.assert_allclose(np.asarray(dec), np.asarray(targets),
                               atol=spec.step / 2 + 1e-6)


def test_sigmoid_bin_training_loss_grads():
    spec = SigmoidBinSpec(bin_count=21, vmin=0.0, vmax=4.0)
    key = jax.random.PRNGKey(0)
    pred = jax.random.normal(key, (16, spec.length))
    tgt = jax.random.uniform(key, (16,), minval=0.0, maxval=4.0)

    def f(p):
        loss, _ = spec.training_loss(p, tgt)
        return loss

    g = jax.grad(f)(pred)
    assert jnp.all(jnp.isfinite(g))
    # loss decreases along negative gradient
    l0 = f(pred)
    l1 = f(pred - 0.1 * g)
    assert float(l1) < float(l0)


def _head_io(head, nc, extra=0):
    x = [jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 16))]
    v = head.init(jax.random.PRNGKey(0), x)
    return head, v, x


def test_ibin_head_shapes_and_decode():
    head = IBin(nc=2, anchors=ANCHORS, ch=(16,), bin_count=21)
    head, v, x = _head_io(head, 2)
    outs = head.apply(v, x, True)
    no = 2 + 3 + 2 * 22
    assert outs[0].shape == (2, 8, 8, 3, no)
    dec = decode_level_bin(outs[0], jnp.asarray(ANCHORS).reshape(3, 2) * 1.0,
                           8.0, bin_count=21, nc=2)
    assert dec.shape == (2, 8 * 8 * 3, 7)
    # wh decoded into the anchor-scaled bin range
    assert float(dec[..., 2:4].min()) >= 0.0


def test_ikeypoint_head_shapes_and_decode():
    head = IKeypoint(nc=1, anchors=ANCHORS, ch=(16,), nkpt=5)
    head, v, x = _head_io(head, 1)
    outs = head.apply(v, x, True)
    no = (1 + 5) + 3 * 5
    assert outs[0].shape == (2, 8, 8, 3, no)
    dec = decode_level_kpt(outs[0], jnp.asarray(ANCHORS).reshape(3, 2) * 1.0,
                           8.0, nc=1, nkpt=5)
    assert dec.shape == (2, 8 * 8 * 3, no)
    # keypoint confidences are probabilities
    kc = dec[..., 6 + 2::3]
    assert float(kc.min()) >= 0.0 and float(kc.max()) <= 1.0


def test_ikeypoint_dw_stack():
    head = IKeypoint(nc=1, anchors=ANCHORS, ch=(16,), nkpt=3,
                     dw_conv_kpt=True)
    x = [jax.random.uniform(jax.random.PRNGKey(1), (1, 8, 8, 16))]
    v = head.init(jax.random.PRNGKey(0), x)
    outs = head.apply(v, x, False, mutable=["batch_stats"])[0]
    assert outs[0].shape == (1, 8, 8, 3, 6 + 9)


def _mini_cfg(head_row):
    return {
        "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Conv", [16, 3, 2]],
                     [-1, 1, "Conv", [32, 3, 2]]],
        "head": [head_row],
    }


def test_ibin_model_end_to_end():
    """IBin through the full model API: init (bias prior), predict
    (binned-wh decode), fuse."""
    from rep_yolo_tpu.models.model import RepYOLO

    model = RepYOLO.from_config(_mini_cfg(
        [[-1], 1, "IBin", ["nc", "anchors", 21]]))
    variables = model.init(jax.random.PRNGKey(0), img_size=32)
    x = jnp.zeros((1, 32, 32, 3))
    pred = model.predict(variables, x)
    assert pred.shape == (1, 8 * 8 * 3, 2 + 5)   # decoded to nc+5
    assert jnp.all(jnp.isfinite(pred))
    assert float(pred[..., 2:4].min()) >= 0.0    # wh from [0,4]*anchor
    deploy, fused = model.fuse(variables)
    pred2 = deploy.predict(fused, x)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2),
                               rtol=1e-4, atol=1e-4)


def test_ikeypoint_model_end_to_end():
    from rep_yolo_tpu.models.model import RepYOLO

    model = RepYOLO.from_config(_mini_cfg(
        [[-1], 1, "IKeypoint", ["nc", "anchors", 5]]))
    variables = model.init(jax.random.PRNGKey(0), img_size=32)
    x = jnp.zeros((1, 32, 32, 3))
    pred = model.predict(variables, x)
    assert pred.shape == (1, 8 * 8 * 3, 2 + 5 + 15)
    deploy, fused = model.fuse(variables)
    pred2 = deploy.predict(fused, x)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(pred2),
                               rtol=1e-4, atol=1e-4)


def test_coco91_map():
    from rep_yolo_tpu.train.evaluate import coco80_to_coco91

    m = coco80_to_coco91()
    assert len(m) == 80
    assert m[0] == 1 and m[79] == 90
    assert len(set(m)) == 80


@pytest.mark.slow
def test_bin_ota_loss_runs_and_descends():
    nc, M, S = 2, 4, 16
    bin_count = 21
    no = nc + 3 + 2 * (bin_count + 1)
    key = jax.random.PRNGKey(0)
    preds = [0.01 * jax.random.normal(key, (2, S, S, 3, no))]
    targets = jnp.zeros((2, M, 5))
    targets = targets.at[:, 0].set(jnp.asarray([1.0, 0.5, 0.5, 0.3, 0.3]))
    targets = targets.at[:, 1].set(jnp.asarray([0.0, 0.25, 0.25, 0.2, 0.2]))
    tmask = jnp.zeros((2, M), bool).at[:, :2].set(True)
    anchors = jnp.asarray(ANCHORS, jnp.float32).reshape(1, 3, 2) / 8.0
    cfg = LossConfig(nc=nc)

    def f(p):
        total, comps = compute_loss_bin_ota(
            [p], targets, tmask, anchors, (8.0,), 128, cfg,
            bin_count=bin_count)
        return total, comps

    (total, comps), g = jax.value_and_grad(f, has_aux=True)(preds[0])
    assert jnp.isfinite(total)
    assert jnp.all(jnp.isfinite(g))
    assert float(jnp.abs(g).sum()) > 0
    (total2, _), _ = jax.value_and_grad(f, has_aux=True)(preds[0] - 1e-2 * g)
    assert float(total2) < float(total)

"""Hub API (AutoShape/Detections/Ensemble), profiler, and offline tools
(reparameterize / prune)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

CFG = "cfg/rep_yolo_tiny_test.yaml"


@pytest.fixture(scope="module")
def tiny_model():
    from rep_yolo_tpu.models.model import RepYOLO

    model = RepYOLO.from_config(CFG)
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    return model, variables


def test_autoshape_roundtrip(tiny_model):
    from rep_yolo_tpu.hub import AutoShape

    model, variables = tiny_model
    deploy, fused = model.fuse(variables)
    shape_net = AutoShape(deploy, fused, size=64, conf=0.001, names=("p",))
    imgs = [np.random.default_rng(0).uniform(0, 255, (48, 80, 3)),
            np.random.default_rng(1).uniform(0, 255, (96, 64, 3))]
    det = shape_net(imgs)
    assert len(det) == 2
    det.print()
    rows = det.pandas()
    assert isinstance(rows, list) and len(rows) == 2
    for i, d in enumerate(det.xyxy):
        if len(d):
            h, w = imgs[i].shape[:2]
            assert d[:, [0, 2]].max() <= w + 1e-3
            assert d[:, [1, 3]].max() <= h + 1e-3
    out = det.save("/tmp/hub_test")
    assert (Path(out) / "image0.txt").exists()


def test_letterbox_np_geometry():
    from rep_yolo_tpu.hub import letterbox_np

    img = np.zeros((50, 100, 3), np.float32)
    out, r, (dw, dh) = letterbox_np(img, 64)
    assert out.shape == (64, 64, 3)
    assert abs(r - 0.64) < 1e-6
    assert dw == 0 and dh == 16


def test_ensemble_concat(tiny_model):
    from rep_yolo_tpu.hub import EnsembleModel

    model, variables = tiny_model
    ens = EnsembleModel([(model, variables), (model, variables)])
    x = jnp.zeros((1, 64, 64, 3))
    single = model.predict(variables, x)
    both = ens.predict(x)
    assert both.shape[1] == 2 * single.shape[1]


def test_profiler_model_info(tiny_model):
    from rep_yolo_tpu.utils.profiler import model_info, profile_fn

    model, variables = tiny_model
    info = model_info(model, variables, img_size=64)
    assert info["params"] > 1000
    stats = profile_fn(
        lambda v, x: model.apply(v, x, train=False),
        variables, jnp.zeros((1, 64, 64, 3)), n=2, warmup=1)
    assert stats["median_ms"] > 0


def test_per_layer_profile(tiny_model):
    from rep_yolo_tpu.utils.profiler import per_layer_profile

    model, variables = tiny_model
    rows = per_layer_profile(model, variables, img_size=64, n=1)
    assert len(rows) == len(model.cfg.layers)
    assert all(r["median_ms"] >= 0 for r in rows)
    assert sum(r["params"] for r in rows) > 1000


@pytest.mark.slow
def test_reparameterize_tool(tiny_model, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    from rep_yolo_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    import reparameterize

    model, variables = tiny_model
    ckpt = tmp_path / "train_ckpt"
    save_checkpoint(ckpt, variables, meta={"epoch": 1})
    out = tmp_path / "deploy_ckpt"
    reparameterize.main(["--cfg", CFG, "--ckpt", str(ckpt),
                         "--out", str(out), "--fp32"])
    meta = json.loads(out.with_suffix(".json").read_text())
    assert meta["deploy"] is True
    deploy_model, fused_direct = model.fuse(variables)
    restored = load_checkpoint(out, fused_direct)
    x = jnp.zeros((1, 64, 64, 3))
    a = deploy_model.predict(fused_direct, x)
    b = deploy_model.predict(restored, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_prune_tool_zeroes_channels(tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import prune as prune_tool

    from rep_yolo_tpu.models.model import RepYOLO

    model = RepYOLO.from_config(CFG)
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    params, report = prune_tool.prune_convbn_tree(
        variables["params"]["l0"], amount=0.5, prefix="l0")
    # RepS_Block contains conv+bn subtrees; at least one should be pruned
    assert report, "no prunable conv found"
    for r in report:
        assert 0 < r["pruned"] < r["out_channels"]

    # full CLI run
    prune_tool.main(["--cfg", CFG, "--amount", "0.5",
                     "--out", str(tmp_path / "pruned"),
                     "--log", str(tmp_path / "prune.log")])
    log = (tmp_path / "prune.log").read_text()
    assert "TOTAL" in log

"""Extended block zoo: every SURVEY §2.2 module builds, runs, and emits the
documented output shape; reparam members fuse exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.nn import blocks as B
from rep_yolo_tpu.nn import orepa as O
from rep_yolo_tpu.nn import transformer as T
from rep_yolo_tpu.nn import zoo as Z

RNG = jax.random.PRNGKey(0)


def run(module, x, **init_kw):
    variables = module.init(RNG, x, **init_kw)
    return module.apply(variables, x, **init_kw)


X16 = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 16))
X32 = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 32))


CASES = [
    # (module, input, expected output shape)
    (Z.RobustConv(24), X16, (2, 16, 16, 24)),
    (Z.RobustConv2(24, s=4), X16, (2, 16, 16, 24)),
    (Z.CrossConv(16, shortcut=True), X16, (2, 16, 16, 16)),
    (Z.MixConv2d(16), X16, (2, 16, 16, 16)),
    # corner padding grows H,W by one before the conv (reference
    # models/common.py:3297-3309 with k3 s1 p1): 16 -> 17
    (Z.SpConv2d(24), X16, (2, 17, 17, 24)),
    (Z.EffStem(24, 3, 2), X16, (2, 8, 8, 24)),
    (Z.Res(16), X16, (2, 16, 16, 16)),
    (Z.Res(64, g=32), X32, (2, 16, 16, 64)),  # ResX path (g=32 | c_=32)
    (Z.Ghost(16), X16, (2, 16, 16, 16)),   # s=1 identity shortcut: c1==c2
    (Z.Ghost(32, s=2), X16, (2, 8, 8, 32)),
    (Z.RepBottleneck(16), X16, (2, 16, 16, 16)),
    (Z.RepRes(16), X16, (2, 16, 16, 16)),
    (Z.CSPA(32, n=2), X16, (2, 16, 16, 32)),
    (Z.CSPB(32, n=1), X16, (2, 16, 16, 32)),
    (Z.CSPC(32, n=2), X16, (2, 16, 16, 32)),
    (Z.CSPA(32, n=1, inner="Res"), X16, (2, 16, 16, 32)),
    (Z.CSPB(32, n=1, inner="Ghost"), X16, (2, 16, 16, 32)),
    (Z.CSPC(32, n=1, inner="RepBottleneck"), X16, (2, 16, 16, 32)),
    (Z.CSPA(32, n=1, inner="RepRes"), X16, (2, 16, 16, 32)),
    (Z.GhostSPPCSPC(32), X16, (2, 16, 16, 32)),
    (Z.GhostStem(32), X16, (2, 4, 4, 32)),
    (Z.SPPFCSPC(32), X16, (2, 16, 16, 32)),
    (Z.ASPP(32), X16, (2, 16, 16, 32)),
    (Z.ChannelAttention(), X32, (2, 16, 16, 32)),
    (Z.SpatialAttention(), X16, (2, 16, 16, 16)),
    (Z.CBAMC3(32, n=1), X16, (2, 16, 16, 32)),
    (Z.CoordAtt(), X32, (2, 16, 16, 32)),
    (Z.InvertedResidual(16, s=1, expand_ratio=2), X16, (2, 16, 16, 16)),
    (Z.InvertedResidual(32, s=2, expand_ratio=1), X16, (2, 8, 8, 32)),
    (Z.Classify(10), X16, (2, 10)),
    (T.TransformerBlock(32, 4, 1), X16, (2, 16, 16, 32)),
    (T.SwinTransformerBlock(32, 4, 2, ws=8), X16, (2, 16, 16, 32)),
    (T.SwinTransformerBlock(32, 4, 2, ws=8, v2=True), X16, (2, 16, 16, 32)),
    (T.SwinTransformerBlockVertical(32, 4, 2, ws=7), X16, (2, 16, 16, 32)),
    (T.C3STR(32, n=1), X16, (2, 16, 16, 32)),
    (T._STCSP(32, n=1, variant="A"), X16, (2, 16, 16, 32)),
    (T._STCSP(32, n=1, variant="B"), X16, (2, 16, 16, 32)),
    (T._STCSP(32, n=1, variant="C", v2=True), X16, (2, 16, 16, 32)),
    (O.ConvBN(24, 3, 1, 1), X16, (2, 16, 16, 24)),
    (O.OREPA3x3RepConv(32, 3, 1), X16, (2, 16, 16, 32)),
    (O.RepConvOREPA(16, 16), X16, (2, 16, 16, 16)),
    (O.RepConvOREPA(16, 32, s=2), X16, (2, 8, 8, 32)),
    (B.GSBottleneck(32, cheap=True), X16, (2, 16, 16, 32)),
    (B.VoVGSCSP(32, cheap=True), X16, (2, 16, 16, 32)),
]


@pytest.mark.parametrize("module,x,shape", CASES,
                         ids=[type(m).__name__ + f"_{i}"
                              for i, (m, _, _) in enumerate(CASES)])
def test_zoo_block_shapes(module, x, shape):
    y = run(module, x)
    assert jnp.all(jnp.isfinite(y))
    if shape is not None:
        assert y.shape == shape


def test_functional_ops():
    a = jnp.arange(2 * 4 * 4 * 8, dtype=jnp.float32).reshape(2, 4, 4, 8)
    b = a + 1
    assert Z.chuncat([a, b]).shape == (2, 4, 4, 16)
    np.testing.assert_allclose(Z.foldcut(a), a[..., :4] + a[..., 4:])
    c = Z.contract(a, 2)
    assert c.shape == (2, 2, 2, 32)
    np.testing.assert_allclose(Z.expand(c, 2), a, rtol=0, atol=0)


def test_transformer_tokens_roundtrip():
    """TransformerLayer keeps token shape and mixes information."""
    x = jax.random.uniform(RNG, (2, 9, 32))
    layer = T.TransformerLayer(32, 4)
    variables = layer.init(RNG, x)
    y = layer.apply(variables, x)
    assert y.shape == x.shape


def test_swin_shift_mask_static():
    m = T._shift_attn_mask(16, 16, 8, 4)
    assert m.shape == (4, 64, 64)
    assert set(np.unique(m)) <= {0.0, -100.0}


def test_orepa_repconv_fuses_exactly():
    """RepConvOREPA deploy-fused output == train-mode eval output."""
    from rep_yolo_tpu.nn.fuse import fuse_variables

    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 16))
    train_mod = O.RepConvOREPA(16, 16)
    variables = train_mod.init(RNG, x)
    # make batch_stats non-trivial
    _, mut = train_mod.apply(variables, x, True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    y_train = train_mod.apply(variables, x, False)

    fused = fuse_variables(variables)
    deploy_mod = O.RepConvOREPA(16, 16, deploy=True)
    y_deploy = deploy_mod.apply(fused, x, False)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_deploy),
                               rtol=1e-4, atol=1e-4)


def test_orepa_standalone_fuses_exactly():
    from rep_yolo_tpu.nn.fuse import fuse_variables

    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 16))
    train_mod = O.OREPA3x3RepConv(24, 3, 1)
    variables = train_mod.init(RNG, x)
    _, mut = train_mod.apply(variables, x, True, mutable=["batch_stats"])
    variables = {"params": variables["params"],
                 "batch_stats": mut["batch_stats"]}
    y_train = train_mod.apply(variables, x, False)

    fused = fuse_variables(variables)
    deploy_mod = O.OREPA3x3RepConv(24, 3, 1, deploy=True)
    y_deploy = deploy_mod.apply(fused, x, False)
    np.testing.assert_allclose(np.asarray(y_train), np.asarray(y_deploy),
                               rtol=1e-4, atol=1e-4)


def test_zoo_graph_via_yaml():
    """A mini YAML graph exercising new parse rules end-to-end."""
    from rep_yolo_tpu.models.model import RepYOLO

    cfg = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "Focus", [16, 3]],
            [-1, 1, "BottleneckCSPA", [32]],
            [-1, 1, "MP", []],
            [-1, 1, "GhostCSPB", [32]],
            [-1, 1, "SPPFCSPC", [32]],
        ],
        "head": [
            [-1, 1, "RepConv_OREPA", [32]],
            [[-1], 1, "IDetect", ["nc", "anchors"]],
        ],
    }
    model = RepYOLO.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), img_size=32)
    x = jnp.zeros((1, 32, 32, 3))
    preds = model.apply(variables, x, train=False)
    assert len(preds) == 1

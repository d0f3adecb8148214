"""Golden parity tests: each block vs the PyTorch reference's activations.

Fixtures in tests/golden/ were produced by tools/gen_goldens.py (reference
module run with random weights, randomized BN stats, eval mode). We import
the torch weights into our flax blocks and demand near-bitwise agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.nn import blocks as B
from rep_yolo_tpu.nn.fuse import fuse_variables
from rep_yolo_tpu.utils.torch_import import import_torch_state
from tests.conftest import load_golden

TOL = dict(rtol=2e-4, atol=2e-5)


def _nhwc(x):
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))


def _nchw(y):
    return np.transpose(np.asarray(y), (0, 3, 1, 2))


def _run(module, fixture, golden_dir, deploy_module=None, tol=TOL):
    g = load_golden(fixture)
    x = _nhwc(g["x"])
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    state = {k: v for k, v in g.items()
             if k not in ("x", "y", "y_fused")}
    variables = import_torch_state(variables, state)
    y = module.apply(variables, x, train=False)
    np.testing.assert_allclose(_nchw(y), g["y"], **tol)
    if "y_fused" in g and deploy_module is not None:
        fused = fuse_variables(variables)
        yf = deploy_module.apply(fused, x, train=False)
        np.testing.assert_allclose(_nchw(yf), g["y_fused"], **tol)
    return variables


def test_conv(golden_dir):
    _run(B.ConvBnAct(32, 3, 2), "block_conv", golden_dir)


def test_reps_stride1(golden_dir):
    _run(B.RepSBlock(32, 32, 3, 1, 1, 1), "block_reps_s1", golden_dir,
         deploy_module=B.RepSBlock(32, 32, 3, 1, 1, 1, deploy=True))


def test_reps_stride2(golden_dir):
    _run(B.RepSBlock(16, 32, 3, 2, 1, 1), "block_reps_s2", golden_dir,
         deploy_module=B.RepSBlock(16, 32, 3, 2, 1, 1, deploy=True))


def test_der(golden_dir):
    _run(B.DERBlock(32, 64, 1, 2), "block_der", golden_dir)


def test_sppcspc(golden_dir):
    _run(B.SPPCSPC(64), "block_sppcspc", golden_dir)


def test_gsconv(golden_dir):
    _run(B.GSConv(64, 1, 1), "block_gsconv", golden_dir)


def test_gsconv_stride2(golden_dir):
    _run(B.GSConv(64, 3, 2), "block_gsconv_s2", golden_dir)


def test_vovgscsp(golden_dir):
    _run(B.VoVGSCSP(64), "block_vovgscsp", golden_dir)


def test_ca_returns_pooled_quirk(golden_dir):
    g = load_golden("block_ca")
    assert g["y"].shape == (2, 64, 1, 1)  # the reference quirk
    _run(B.CA(64), "block_ca", golden_dir)


def test_crisscross(golden_dir):
    _run(B.CrissCrossAttention(64), "block_cca", golden_dir)


def test_vertical(golden_dir):
    _run(B.VerticalAttention(64), "block_va", golden_dir)


def test_ccva(golden_dir):
    _run(B.CCVA(64), "block_ccva", golden_dir)


def test_repconv(golden_dir):
    _run(B.RepConv(64, 64), "block_repconv", golden_dir)


def test_repconv_c1_ne_c2(golden_dir):
    _run(B.RepConv(32, 64), "block_repconv_c2", golden_dir)


def test_repconv_fuse(golden_dir):
    g = load_golden("block_repconv_fuse")
    x = _nhwc(g["x"])
    module = B.RepConv(64, 64)
    variables = module.init(jax.random.PRNGKey(0), x, train=False)
    state = {k: v for k, v in g.items() if k not in ("x", "y", "y_fused")}
    variables = import_torch_state(variables, state)
    y = module.apply(variables, x, train=False)
    np.testing.assert_allclose(_nchw(y), g["y"], **TOL)
    fused = fuse_variables(variables)
    deploy = B.RepConv(64, 64, deploy=True)
    yf = deploy.apply(fused, x, train=False)
    np.testing.assert_allclose(_nchw(yf), g["y_fused"], **TOL)


def test_maxpool(golden_dir):
    g = load_golden("block_mp")
    y = B.max_pool(_nhwc(g["x"]), 2, 2)
    np.testing.assert_allclose(_nchw(y), g["y"], **TOL)
    g = load_golden("block_sp")
    y = B.max_pool(_nhwc(g["x"]), 3, 1, 1)
    np.testing.assert_allclose(_nchw(y), g["y"], **TOL)

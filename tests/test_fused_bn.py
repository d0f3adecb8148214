"""Fused training-BN statistics in RepSBlock (blocks.set_fused_train_bn).

The fused path computes every branch BN's batch statistics in ONE
channel-concat reduce and the normalize + branch-sum in one elementwise
fusion (b8 train trace: the per-branch 48-lane reduce_sums are ~18 ms of
the 218 ms step). It must be numerically equivalent to the per-branch
flax BatchNorm path and share its exact parameter/batch-stats tree
(reference BN semantics: utils/torch_utils.py:149-151 momentum/eps).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.nn import blocks
from rep_yolo_tpu.nn.blocks import RepSBlock


@pytest.fixture
def fused_flag():
    """Restore the module flag after each test."""
    prev = blocks.FUSED_TRAIN_BN
    yield
    blocks.set_fused_train_bn(prev)


def _run(block, variables, x, fused: bool):
    blocks.set_fused_train_bn(fused)
    out, mut = block.apply(variables, x, train=True,
                           mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
    return out, mut["batch_stats"]


def _mk(c1=24, c2=24, s=1, branches=2, seed=0, dtype=jnp.float32):
    block = RepSBlock(c1, c2, 3, s, 1, num_conv_branches=branches)
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 16, 16, c1), dtype)
    variables = block.init(jax.random.PRNGKey(7), x, train=True)
    if dtype == jnp.bfloat16:
        # the trainer's mixed-precision path casts ALL params to bf16
        # compute copies (trainer.py:112-118); batch stats stay f32
        variables = dict(variables)
        variables["params"] = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16), variables["params"])
    return block, variables, x


@pytest.mark.parametrize("s,branches", [(1, 2), (2, 1), (1, 1)])
def test_fused_matches_unfused(fused_flag, s, branches):
    """Output and updated running stats match the per-branch BN path for
    every branch topology (skip+scale+N, scale+N, single conv)."""
    block, variables, x = _mk(s=s, branches=branches)
    ref, ref_stats = _run(block, variables, x, fused=False)
    got, got_stats = _run(block, variables, x, fused=True)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        got_stats, ref_stats)


def test_fused_matches_unfused_bf16(fused_flag):
    """Mixed-precision training path: bf16 activations, f32 stats."""
    block, variables, x = _mk(dtype=jnp.bfloat16)
    ref, ref_stats = _run(block, variables, x, fused=False)
    got, got_stats = _run(block, variables, x, fused=True)
    assert got.dtype == ref.dtype == jnp.bfloat16
    np.testing.assert_allclose(got.astype(np.float32), ref.astype(np.float32),
                               rtol=2e-2, atol=2e-2)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        got_stats, ref_stats)


def test_fused_grads_match(fused_flag):
    """Parameter gradients through the fused stats match the BN path."""
    block, variables, x = _mk()

    def loss(params, fused):
        blocks.set_fused_train_bn(fused)
        out, _ = block.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out * out)

    g_ref = jax.grad(loss)(variables["params"], False)
    g_fus = jax.grad(loss)(variables["params"], True)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5),
        g_fus, g_ref)


def test_fused_tree_identical(fused_flag):
    """init() under either flag declares the same params AND batch_stats
    tree — checkpoints are interchangeable."""
    block = RepSBlock(24, 24, 3, 1, 1, num_conv_branches=2)
    x = jnp.zeros((1, 8, 8, 24))
    blocks.set_fused_train_bn(False)
    v_ref = block.init(jax.random.PRNGKey(0), x, train=True)
    blocks.set_fused_train_bn(True)
    v_fus = block.init(jax.random.PRNGKey(0), x, train=True)
    assert (jax.tree_util.tree_structure(v_ref)
            == jax.tree_util.tree_structure(v_fus))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 v_ref, v_fus)

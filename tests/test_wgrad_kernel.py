"""Pallas wgrad kernel vs jax.grad of the XLA conv (interpret mode on
CPU; the same code path compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.ops.pallas.wgrad_kernel import (conv3x3_pallas_wgrad,
                                                  wgrad3x3_nhwc)


def _ref_wgrad(x, dy):
    def loss(w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * dy)

    C, O = x.shape[-1], dy.shape[-1]
    return jax.grad(loss)(jnp.zeros((3, 3, C, O), x.dtype))


@pytest.mark.parametrize("shape", [(2, 8, 16, 8, 8), (1, 12, 12, 16, 8)])
def test_wgrad_matches_autodiff(shape):
    B, H, W, C, O = shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (B, H, W, C), jnp.float32)
    dy = jax.random.normal(k2, (B, H, W, O), jnp.float32)
    dw = wgrad3x3_nhwc(x, dy)
    ref = _ref_wgrad(x, dy)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_wgrad_row_tile_invariance():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (1, 16, 8, 8), jnp.float32)
    dy = jax.random.normal(k2, (1, 16, 8, 8), jnp.float32)
    a = wgrad3x3_nhwc(x, dy, row_tile=16)
    b = wgrad3x3_nhwc(x, dy, row_tile=4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)


def test_blocks_flag_routes_and_matches():
    """set_pallas_wgrad(True): a ConvUnit-based block's param grads
    match the flag-off path."""
    import rep_yolo_tpu.nn.blocks as B

    conv = B.ConvBnAct(8, 3, 1, name="c")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 8))
    v = conv.init(jax.random.PRNGKey(4), x, train=True)

    def loss(params):
        y, _ = conv.apply({"params": params,
                           "batch_stats": v["batch_stats"]}, x,
                          train=True, mutable=["batch_stats"])
        return jnp.sum(y * y)

    ref = jax.grad(loss)(v["params"])
    try:
        B.set_pallas_wgrad(True, select=lambda c1, c2: True)
        got = jax.grad(loss)(v["params"])
    finally:
        B.set_pallas_wgrad(False)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_custom_vjp_conv_grads():
    """conv3x3_pallas_wgrad: forward identical to XLA, both grads match
    autodiff of the plain conv."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (2, 8, 8, 8), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 8, 8), jnp.float32) * 0.1
    t = jax.random.normal(k3, (2, 8, 8, 8), jnp.float32)

    def loss_pallas(x, w):
        return jnp.sum(conv3x3_pallas_wgrad(x, w) * t)

    def loss_xla(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(y * t)

    np.testing.assert_allclose(float(loss_pallas(x, w)),
                               float(loss_xla(x, w)), rtol=1e-5)
    gx, gw = jax.grad(loss_pallas, (0, 1))(x, w)
    rx, rw = jax.grad(loss_xla, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                               rtol=1e-4, atol=1e-4)

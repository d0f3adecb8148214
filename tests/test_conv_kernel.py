"""Pallas channel-major conv kernels vs XLA conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.ops.pallas.conv_kernel import conv1x1_cmajor, conv3x3_cmajor


def _ref_conv(x_cm, w, bias, k):
    x_nhwc = jnp.transpose(x_cm, (0, 2, 3, 1)).astype(jnp.float32)
    p = k // 2
    y = jax.lax.conv_general_dilated(
        x_nhwc, w.astype(jnp.float32), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    y = y * jax.nn.sigmoid(y)
    return jnp.transpose(y, (0, 3, 1, 2))


@pytest.mark.parametrize("C,O", [(48, 48), (24, 24), (16, 32)])
def test_conv3x3_cmajor_matches_xla(C, O):
    B, H, W = 2, 32, 128
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W)) - 0.5
    w = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(2), (O,)) - 0.5
    y = conv3x3_cmajor(x, w, bias, row_tile=8)
    ref = _ref_conv(x, w, bias, 3)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_conv3x3_border_zero_padding():
    """Halo wrap-around must NOT leak: row 0 sees zeros above, and the
    lane-packed layout's previous-row tail must not bleed in."""
    B, C, O, H, W = 1, 16, 16, 16, 128
    x = jnp.ones((B, C, H, W))
    w = jnp.ones((3, 3, C, O)) / (9 * C)
    y = conv3x3_cmajor(x, w, jnp.zeros(O), act=None, row_tile=8)
    # interior = 1.0; edges see 6/9 (one missing row OR col), corners 4/9
    np.testing.assert_allclose(float(y[0, 0, 5, 5]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(y[0, 0, 0, 5]), 6 / 9, rtol=1e-5)
    np.testing.assert_allclose(float(y[0, 0, 5, 0]), 6 / 9, rtol=1e-5)
    np.testing.assert_allclose(float(y[0, 0, 0, 0]), 4 / 9, rtol=1e-5)
    np.testing.assert_allclose(float(y[0, 0, H - 1, W - 1]), 4 / 9, rtol=1e-5)


def test_conv1x1_cmajor_matches_xla():
    B, C, O, H, W = 2, 144, 48, 16, 128
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, C, H, W)) - 0.5
    w = jax.random.uniform(jax.random.PRNGKey(4), (1, 1, C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(5), (O,)) - 0.5
    y = conv1x1_cmajor(x, w, bias, row_tile=8)
    ref = _ref_conv(x, w, bias, 1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

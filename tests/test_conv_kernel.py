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


def _ref_conv_q8(x_cm, w, bias, k, s_in, act="silu"):
    """Emulate the kernel's quantization exactly: per-out-channel weight
    scales, per-tensor act scale, s32 accumulate, f32 dequant+bias+act."""
    C = x_cm.shape[1]
    O = w.shape[-1]
    wf = w.astype(jnp.float32).reshape(-1, O)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / s_w), -127, 127)
    x_q = jnp.clip(jnp.round(x_cm.astype(jnp.float32) / s_in), -127, 127)
    x_nhwc = jnp.transpose(x_q, (0, 2, 3, 1))
    p = k // 2
    acc = jax.lax.conv_general_dilated(
        x_nhwc, w_q.reshape(w.shape), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = acc * (s_w * s_in) + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return jnp.transpose(y, (0, 3, 1, 2))


@pytest.mark.parametrize("C,O", [(48, 48), (24, 48), (16, 32)])
def test_conv3x3_q8_matches_emulated_int8(C, O):
    from rep_yolo_tpu.ops.pallas.conv_kernel import conv3x3_cmajor_q8

    B, H, W = 2, 16, 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W)) * 2 - 1
    w = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(2), (O,)) - 0.5
    s_in = 1.0 / 127.0
    y = conv3x3_cmajor_q8(x, w, bias, s_in, row_tile=8)
    ref = _ref_conv_q8(x, w, bias, 3, s_in)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # int8 quantization error vs the true float conv stays small
    reff = _ref_conv(x, w, bias, 3)
    err = np.abs(np.asarray(y, np.float32) - np.asarray(reff)).max()
    assert err < 0.1, f"quantization error too large: {err}"


def test_conv3x3_q8_int8_resident_chain():
    """out_scale emits int8 that the next conv consumes directly (the
    int8-resident dataflow that keeps s32/f32 off HBM between convs)."""
    from rep_yolo_tpu.ops.pallas.conv_kernel import conv3x3_cmajor_q8

    B, C, H, W = 1, 16, 16, 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W)) * 2 - 1
    w1 = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, C)) - 0.5
    w2 = jax.random.uniform(jax.random.PRNGKey(2), (3, 3, C, C)) - 0.5
    b = jnp.zeros(C)
    s1 = 1.0 / 127.0
    # stage 1 emits int8 at scale s2; stage 2 consumes it as-is
    y1f = _ref_conv_q8(x, w1, b, 3, s1)
    s2 = float(jnp.max(jnp.abs(y1f))) / 127.0
    y1_q = conv3x3_cmajor_q8(x, w1, b, s1, out_scale=s2, row_tile=8)
    assert y1_q.dtype == jnp.int8
    y2 = conv3x3_cmajor_q8(y1_q, w2, b, s2, row_tile=8)
    ref2 = _ref_conv_q8(y1f, w2, b, 3, s2)
    np.testing.assert_allclose(np.asarray(y2, np.float32), np.asarray(ref2),
                               rtol=5e-2, atol=5e-2)


def test_conv1x1_q8_matches_emulated_int8():
    from rep_yolo_tpu.ops.pallas.conv_kernel import conv1x1_cmajor_q8

    B, C, O, H, W = 2, 48, 24, 16, 64
    x = jax.random.uniform(jax.random.PRNGKey(3), (B, C, H, W)) * 2 - 1
    w = jax.random.uniform(jax.random.PRNGKey(4), (1, 1, C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(5), (O,)) - 0.5
    s_in = 1.0 / 127.0
    y = conv1x1_cmajor_q8(x, w, bias, s_in, row_tile=8)
    ref = _ref_conv_q8(x, w, bias, 1, s_in)
    np.testing.assert_allclose(np.asarray(y, np.float32), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


class _DerOnly:
    """Minimal model wrapper for quant.calibrate over a lone DERBlock."""

    def __init__(self, mod):
        self.mod = mod

    def apply(self, variables, x, train=False):
        return self.mod.apply(variables, x, train=train)


@pytest.mark.parametrize("mode", ["bf16", "q8", "xla_q8"])
def test_der_fast_deploy_matches_regular(mode):
    """DERBlock deploy fast path (channel-major / int8-resident kernels)
    vs the regular XLA deploy path: bf16 is near-exact; the q8 modes stay
    within int8 quantization tolerance."""
    import rep_yolo_tpu.nn.blocks as B
    from rep_yolo_tpu.ops import quant

    c1, c2, H = 16, 24, 32
    der = B.DERBlock(c1, c2, deploy=True, name="der")
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, H, c1)) * 2 - 1
    variables = der.init(jax.random.PRNGKey(1), x, train=False)
    ref = der.apply(variables, x, train=False)

    scales = None
    if mode in ("q8", "xla_q8"):
        scales = quant.calibrate(_DerOnly(der), variables, [x])
        assert len(scales) == 13, sorted(scales)

    try:
        B.set_cmajor_deploy(mode, scales, select=lambda c, h, w: True)
        out = der.apply(variables, x, train=False)
    finally:
        B.set_cmajor_deploy(None)

    # param tree identical between paths
    v2 = der.init(jax.random.PRNGKey(1), x, train=False)
    assert jax.tree_util.tree_structure(variables) == \
        jax.tree_util.tree_structure(v2)

    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    if mode == "bf16":
        assert err / scale < 2e-2, f"bf16 fast path diverges: {err}"
    else:
        assert err / scale < 0.15, f"int8 fast path diverges: {err}"
    # and it actually produces correlated outputs, not garbage
    corr = np.corrcoef(np.asarray(out, np.float32).ravel(),
                       np.asarray(ref).ravel())[0, 1]
    assert corr > 0.99, corr

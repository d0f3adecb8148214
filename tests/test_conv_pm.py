"""v3 pixel-major Pallas conv kernels vs emulated int8 XLA conv
(interpret mode on CPU). See ops/pallas/conv_pm.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.ops.pallas.conv_pm import conv1x1_pm_q8, conv3x3_pm_q8


def _ref_conv_q8(x_nhwc, w, bias, k, s_in, act="silu"):
    """Kernel-exact int8 emulation: per-out-channel weight scales,
    per-tensor act scale, s32 accumulate, f32 dequant+bias+act."""
    O = w.shape[-1]
    wf = w.astype(jnp.float32).reshape(-1, O)
    s_w = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-12) / 127.0
    w_q = jnp.clip(jnp.round(wf / s_w), -127, 127)
    x_q = jnp.clip(jnp.round(x_nhwc.astype(jnp.float32) / s_in), -127, 127)
    p = k // 2
    acc = jax.lax.conv_general_dilated(
        x_q, w_q.reshape(w.shape), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = acc * (s_w * s_in) + bias
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y


# W=320 exercises the residue-16 sublane-misaligned DMA path; W=64 the
# aligned one; rt=H the single-tile branch; 40x40/80x80 are the deep-DER
# (l7/l5) geometries where pick_row_tile falls back to the whole height
@pytest.mark.parametrize("B,C,O,H,W,rt", [
    (1, 8, 8, 8, 320, 4),
    (2, 16, 24, 16, 64, 8),
    (1, 8, 8, 12, 96, 4),
    (1, 8, 8, 4, 320, 4),
    (1, 16, 16, 40, 40, None),
    (1, 16, 16, 80, 80, None),
])
def test_conv3x3_pm_q8_matches_emulated(B, C, O, H, W, rt):
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C)) * 2 - 1
    w = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(2), (O,)) - 0.5
    s_in = 1.0 / 127.0
    y = conv3x3_pm_q8(x.reshape(B, H * W, C), w, bias, s_in, H, W,
                      row_tile=rt)
    ref = _ref_conv_q8(x, w, bias, 3, s_in)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(B, H, W, O), np.asarray(ref),
        rtol=2e-2, atol=2e-2)


def test_conv3x3_pm_q8_int8_chain():
    B, C, H, W = 1, 16, 16, 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C)) * 2 - 1
    w1 = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, C)) - 0.5
    w2 = jax.random.uniform(jax.random.PRNGKey(2), (3, 3, C, C)) - 0.5
    b = jnp.zeros(C)
    s1 = 1.0 / 127.0
    y1f = _ref_conv_q8(x, w1, b, 3, s1)
    s2 = float(jnp.max(jnp.abs(y1f))) / 127.0
    y1q = conv3x3_pm_q8(x.reshape(B, H * W, C), w1, b, s1, H, W,
                        out_scale=s2, row_tile=8)
    assert y1q.dtype == jnp.int8
    y2 = conv3x3_pm_q8(y1q, w2, b, s2, H, W, row_tile=8)
    ref2 = _ref_conv_q8(y1f, w2, b, 3, s2)
    np.testing.assert_allclose(
        np.asarray(y2, np.float32).reshape(B, H, W, C), np.asarray(ref2),
        rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize("H,W", [
    (16, 64),
    (40, 40),   # HW=1600 has no 128-multiple divisor: whole-array tile
])
def test_conv1x1_pm_q8_multi_input_equals_concat(H, W):
    B, C, O = 2, 16, 24
    xs = [jax.random.uniform(jax.random.PRNGKey(10 + i),
                             (B, H * W, C)) * 2 - 1 for i in range(3)]
    wc = jax.random.uniform(jax.random.PRNGKey(20), (1, 1, 3 * C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(21), (O,)) - 0.5
    s_in = 1.0 / 127.0
    y = conv1x1_pm_q8(xs, wc, bias, s_in)
    cat = jnp.concatenate([xi.reshape(B, H, W, C) for xi in xs], axis=-1)
    ref = _ref_conv_q8(cat, wc, bias, 1, s_in)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(B, H, W, O), np.asarray(ref),
        rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_pm_network_q8_gate_parity():
    """Full tiny graph with the q8 fast path (v3 pixel-major kernels)
    vs the plain deploy path: outputs stay within int8 tolerance."""
    import rep_yolo_tpu.nn.blocks as B
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.ops import quant

    model = RepYOLO.from_config("cfg/rep_yolo_tiny_test.yaml")
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    deploy, fused = model.fuse(variables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    ref = deploy.predict(fused, x)
    scales = quant.calibrate(deploy, fused, [x])
    try:
        B.set_cmajor_deploy("q8", scales, select=lambda c, h, w: True)
        out = deploy.predict(fused, x)
    finally:
        B.set_cmajor_deploy(None)
    ref, out = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.99, corr

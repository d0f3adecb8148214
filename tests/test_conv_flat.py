"""v2 flat-layout Pallas conv kernels vs emulated int8 XLA conv
(interpret mode on CPU). See ops/pallas/conv_flat.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.ops.pallas.conv_flat import (
    conv1x1_flat_q8, conv3x3_flat_q8, max_pool_cm)


def _ref_conv_q8(x_cm, w, bias, k, s_in, act="silu"):
    """Kernel-exact int8 emulation: per-out-channel weight scales,
    per-tensor act scale, s32 accumulate, f32 dequant+bias+act."""
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


# W=320 exercises the 64-lane misaligned DMA path; W=64 the aligned one;
# row_tile=H the single-tile branch; 40x40/80x80 are the deep-DER (l7/l5)
# geometries where pick_row_tile falls back to the whole height
@pytest.mark.parametrize("B,C,O,H,W,rt", [
    (1, 8, 8, 8, 320, 4),
    (2, 16, 24, 16, 64, 8),
    (1, 8, 8, 12, 96, 4),
    (1, 8, 8, 4, 320, 4),
    (1, 16, 16, 40, 40, None),
    (1, 16, 16, 80, 80, None),
])
def test_conv3x3_flat_q8_matches_emulated(B, C, O, H, W, rt):
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W)) * 2 - 1
    w = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(2), (O,)) - 0.5
    s_in = 1.0 / 127.0
    y = conv3x3_flat_q8(x.reshape(B, C, H * W), w, bias, s_in, H, W,
                        row_tile=rt)
    ref = _ref_conv_q8(x, w, bias, 3, s_in)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(B, O, H, W), np.asarray(ref),
        rtol=2e-2, atol=2e-2)


def test_conv3x3_flat_q8_int8_chain():
    B, C, H, W = 1, 16, 16, 64
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W)) * 2 - 1
    w1 = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, C)) - 0.5
    w2 = jax.random.uniform(jax.random.PRNGKey(2), (3, 3, C, C)) - 0.5
    b = jnp.zeros(C)
    s1 = 1.0 / 127.0
    y1f = _ref_conv_q8(x, w1, b, 3, s1)
    s2 = float(jnp.max(jnp.abs(y1f))) / 127.0
    y1q = conv3x3_flat_q8(x.reshape(B, C, H * W), w1, b, s1, H, W,
                          out_scale=s2, row_tile=8)
    assert y1q.dtype == jnp.int8
    y2 = conv3x3_flat_q8(y1q, w2, b, s2, H, W, row_tile=8)
    ref2 = _ref_conv_q8(y1f, w2, b, 3, s2)
    np.testing.assert_allclose(
        np.asarray(y2, np.float32).reshape(B, C, H, W), np.asarray(ref2),
        rtol=6e-2, atol=6e-2)


@pytest.mark.parametrize("H,W", [
    (16, 64),
    (40, 40),   # HW=1600 has no 128-multiple divisor: whole-array tile
])
def test_conv1x1_flat_q8_multi_input_equals_concat(H, W):
    B, C, O = 2, 16, 24
    xs = [jax.random.uniform(jax.random.PRNGKey(10 + i),
                             (B, C, H * W)) * 2 - 1 for i in range(3)]
    wc = jax.random.uniform(jax.random.PRNGKey(20), (1, 1, 3 * C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(21), (O,)) - 0.5
    s_in = 1.0 / 127.0
    y = conv1x1_flat_q8(xs, wc, bias, s_in)
    cat = jnp.concatenate([xi.reshape(B, C, H, W) for xi in xs], axis=1)
    ref = _ref_conv_q8(cat, wc, bias, 1, s_in)
    np.testing.assert_allclose(
        np.asarray(y, np.float32).reshape(B, O, H, W), np.asarray(ref),
        rtol=2e-2, atol=2e-2)


def test_max_pool_cm_matches_reduce_window():
    x = jax.random.uniform(jax.random.PRNGKey(30), (2, 16, 16, 64))
    ref = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    np.testing.assert_allclose(np.asarray(max_pool_cm(x)), np.asarray(ref))


@pytest.mark.slow
def test_cm_mp_network_gate_parity():
    """Full tiny graph with the cm fast path + cm MP (executor gate) vs
    the plain deploy path: outputs stay within int8 tolerance."""
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


@pytest.mark.parametrize("C,H,W,dtype", [(48, 320, 320, jnp.int8),
                                         (96, 160, 160, jnp.int8),
                                         (32, 64, 64, jnp.float32),
                                         # whole-image channel-tiled
                                         # variant (deep MP shapes)
                                         (256, 80, 80, jnp.int8),
                                         (512, 40, 40, jnp.int8),
                                         (192, 80, 80, jnp.float32)])
def test_max_pool2_flat_matches_reshape_max(C, H, W, dtype):
    """Flat-layout Pallas 2x2/s2 pool vs the reshape+max reference
    (reference MP, models/common.py:32), exact in int8 and f32."""
    from rep_yolo_tpu.ops.pallas.pool_flat import max_pool2_flat, supports

    assert supports(C, H, W)
    rng = np.random.default_rng(0)
    x4 = rng.integers(-127, 128, (2, C, H, W)).astype(
        np.int8 if dtype == jnp.int8 else np.float32)
    ref = x4.reshape(2, C, H // 2, 2, W // 2, 2).max(axis=(3, 5))
    y = max_pool2_flat(jnp.asarray(x4.reshape(2, C, H * W)), H, W,
                       interpret=True)
    np.testing.assert_array_equal(
        np.asarray(y).reshape(2, C, H // 2, W // 2), ref)


def test_max_pool2_flat_supports_gate():
    from rep_yolo_tpu.ops.pallas.pool_flat import supports

    assert supports(48, 320, 320) and supports(96, 160, 160)
    # no 128-aligned output row tile -> whole-image variant (round 4)
    assert supports(192, 80, 80)
    assert supports(256, 80, 80) and supports(512, 40, 40)
    assert not supports(48, 321, 320)  # odd H


@pytest.mark.parametrize("H,W,out_s", [
    (16, 64, 0.013),      # aligned rows, int8 out
    (16, 64, None),       # bf16 out
    (8, 320, 0.013),      # l1-like W (TR alignment via W2*TR%128)
])
def test_conv1x1_pool_fused_bitexact(H, W, out_s):
    """conv1x1_flat_q8(pool_hw=...) must be BIT-identical to the unfused
    conv -> max_pool2_flat chain: requant (round/clip/bf16-cast) is
    monotone non-decreasing, so it commutes with max."""
    from rep_yolo_tpu.ops.pallas.conv_flat import pool_fusible
    from rep_yolo_tpu.ops.pallas.pool_flat import max_pool2_flat

    assert pool_fusible(H, W)
    B, C, O = 2, 16, 24
    xs = [(jax.random.uniform(ks, (B, C, H * W)) * 254 - 127).astype(jnp.int8)
          for ks in jax.random.split(jax.random.PRNGKey(3), 3)]
    wc = jax.random.uniform(jax.random.PRNGKey(4), (1, 1, 3 * C, O)) - 0.5
    bias = jax.random.uniform(jax.random.PRNGKey(5), (O,)) - 0.5
    ref = conv1x1_flat_q8(xs, wc, bias, 1.0, out_scale=out_s)
    ref = max_pool2_flat(ref, H, W)
    y = conv1x1_flat_q8(xs, wc, bias, 1.0, out_scale=out_s, pool_hw=(H, W))
    assert y.shape == (B, O, (H // 2) * (W // 2))
    np.testing.assert_array_equal(np.asarray(y, np.float32),
                                  np.asarray(ref, np.float32))


@pytest.mark.slow
def test_cm_pool_fuse_network_bitexact():
    """q8 region with the MP-into-cv1 fusion ON vs OFF on a tiny graph
    holding the flagship's DER->MP->DER backbone pattern: identical
    outputs, and the plan must actually show a fused MP (engagement
    guard — a silent fall-through would pass vacuously)."""
    import rep_yolo_tpu.nn.blocks as B
    from rep_yolo_tpu.models import network as net_lib
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.ops import quant

    cfg = {
        "nc": 1, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [
            [-1, 1, "RepS_Block", [8, 3, 2, 1]],   # 0 /2
            [-1, 1, "MP", []],                     # 1 /4
            [-1, 1, "DER_Block", [16, 1, 1]],      # 2
            [-1, 1, "MP", []],                     # 3 /8  <- fusable
            [-1, 1, "DER_Block", [16, 1, 1]],      # 4
        ],
        "head": [
            [-1, 1, "Conv", [16, 1, 1]],           # 5
            [[-1], 1, "IDetect", ["nc", "anchors"]],  # 6
        ],
    }
    model = RepYOLO.from_config(cfg)
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    deploy, fused = model.fuse(variables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    scales = quant.calibrate(deploy, fused, [x])
    try:
        B.set_cmajor_deploy("q8", scales, select=lambda c, h, w: True)
        B.set_cmajor_pool_fuse(False)
        ref = deploy.predict(fused, x)
        assert not any("fused into" in d
                       for d in net_lib.LAST_REGION_PLAN.values())
        B.set_cmajor_pool_fuse(True)
        out = deploy.predict(fused, x)
        assert any("fused into" in d
                   for d in net_lib.LAST_REGION_PLAN.values()), \
            net_lib.LAST_REGION_PLAN
    finally:
        B.set_cmajor_deploy(None)
        B.set_cmajor_pool_fuse(True)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))

"""Parity tests for the flat int8 neck kernels (ops/pallas/neck_flat.py)
against plain-XLA NHWC references, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.ops.pallas import neck_flat


def _flat(x_nhwc):
    """NHWC -> flat (B, C, H*W)."""
    b, h, w, c = x_nhwc.shape
    return jnp.transpose(x_nhwc, (0, 3, 1, 2)).reshape(b, c, h * w)


def _nhwc(x_flat, h, w):
    b, c, _ = x_flat.shape
    return jnp.transpose(x_flat.reshape(b, c, h, w), (0, 2, 3, 1))


def _quant(x, s):
    return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)


@pytest.mark.parametrize("c,h,w", [(32, 16, 16), (64, 8, 12)])
def test_dwconv5x5_flat_q8(c, h, w):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, w, c), jnp.float32)
    wk = jax.random.normal(k2, (5, 5, 1, c), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (c,), jnp.float32) * 0.1
    s_in = float(jnp.max(jnp.abs(x))) / 127.0

    xq = _quant(x, s_in)
    # reference: depthwise conv on the dequantized ints, same-pad
    xd = xq.astype(jnp.float32) * s_in
    ref = jax.lax.conv_general_dilated(
        xd, wk, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c) + bias
    ref = ref * jax.nn.sigmoid(ref)

    got = neck_flat.dwconv5x5_flat_q8(_flat(xq), wk, bias, s_in, h, w)
    np.testing.assert_allclose(np.asarray(_nhwc(got, h, w), np.float32),
                               np.asarray(ref), rtol=2e-2, atol=2e-2)

    # int8-resident output path
    out_s = float(jnp.max(jnp.abs(ref))) / 127.0
    got_q = neck_flat.dwconv5x5_flat_q8(_flat(xq), wk, bias, s_in, h, w,
                                        out_scale=out_s)
    assert got_q.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(_nhwc(got_q, h, w), np.float32) * out_s,
        np.asarray(ref), atol=out_s + 2e-2)

    # float input variant quantizes in-kernel at s_in
    got_f = neck_flat.dwconv5x5_flat_q8(_flat(x), wk, bias, s_in, h, w)
    np.testing.assert_allclose(np.asarray(got_f, np.float32),
                               np.asarray(got, np.float32),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("c,o,h,w", [(16, 24, 16, 16), (32, 32, 8, 12)])
def test_conv5x5_flat_q8(c, o, h, w):
    """Dense 5x5 kernel parity (tiled-DMA 16x16 and whole-image 8x12
    paths) + the depthwise block-diagonal embedding it exists for."""
    from rep_yolo_tpu.ops.pallas.conv_flat import conv5x5_flat_q8

    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (2, h, w, c), jnp.float32)
    wk = jax.random.normal(k2, (5, 5, c, o), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (o,), jnp.float32) * 0.1
    s_in = float(jnp.max(jnp.abs(x))) / 127.0

    xq = _quant(x, s_in)
    xd = xq.astype(jnp.float32) * s_in
    ref = jax.lax.conv_general_dilated(
        xd, wk, (1, 1), ((2, 2), (2, 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    ref = ref * jax.nn.sigmoid(ref)

    got = conv5x5_flat_q8(_flat(xq), wk, bias, s_in, h, w)
    np.testing.assert_allclose(np.asarray(_nhwc(got, h, w), np.float32),
                               np.asarray(ref), rtol=5e-2, atol=5e-2)

    # int8-resident output
    out_s = float(jnp.max(jnp.abs(ref))) / 127.0
    got_q = conv5x5_flat_q8(_flat(xq), wk, bias, s_in, h, w,
                            out_scale=out_s)
    assert got_q.dtype == jnp.int8
    np.testing.assert_allclose(
        np.asarray(_nhwc(got_q, h, w), np.float32) * out_s,
        np.asarray(ref), atol=out_s + 5e-2)

    # depthwise embedding == the VPU depthwise kernel (same math)
    wdw = jax.random.normal(k2, (5, 5, 1, c), jnp.float32) * 0.1
    idx = jnp.arange(c)
    kd = jnp.zeros((5, 5, c, c), jnp.float32).at[:, :, idx, idx].set(
        wdw[:, :, 0, :])
    got_dw = conv5x5_flat_q8(_flat(xq), kd, bias[:c], s_in, h, w)
    ref_dw = neck_flat.dwconv5x5_flat_q8(_flat(xq), wdw, bias[:c],
                                         s_in, h, w)
    np.testing.assert_allclose(np.asarray(got_dw, np.float32),
                               np.asarray(ref_dw, np.float32),
                               rtol=5e-2, atol=5e-2)


def test_spp_pools_flat():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 20, 20, 32), jnp.float32)
    s = float(jnp.max(jnp.abs(x))) / 127.0
    xq = _quant(x, s)

    got = neck_flat.spp_pools_flat(_flat(xq), 20, 20)
    assert got.shape == (2, 4 * 32, 400) and got.dtype == jnp.int8

    xd = xq.astype(jnp.float32)
    for i, k in enumerate((5, 9, 13)):
        ref = jax.lax.reduce_window(
            xd, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
            [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)])
        sec = got[:, (i + 1) * 32:(i + 2) * 32, :]
        np.testing.assert_array_equal(
            np.asarray(_nhwc(sec, 20, 20), np.float32), np.asarray(ref))
    np.testing.assert_array_equal(np.asarray(got[:, :32, :]),
                                  np.asarray(_flat(xq)))


def test_conv3x3s2_flat_q8():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    c, o, h, w = 16, 24, 16, 16
    x = jax.random.normal(k1, (2, h, w, c), jnp.float32)
    wk = jax.random.normal(k2, (3, 3, c, o), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (o,), jnp.float32) * 0.1
    s_in = float(jnp.max(jnp.abs(x))) / 127.0
    xq = _quant(x, s_in)

    xd = xq.astype(jnp.float32) * s_in
    ref = jax.lax.conv_general_dilated(
        xd, wk, (2, 2), ((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    ref = ref * jax.nn.sigmoid(ref)

    got = neck_flat.conv3x3s2_flat_q8(_flat(xq), wk, bias, s_in, h, w)
    assert got.shape == (2, o, (h // 2) * (w // 2))
    np.testing.assert_allclose(
        np.asarray(_nhwc(got, h // 2, w // 2), np.float32),
        np.asarray(ref), rtol=4e-2, atol=4e-2)


def test_upsample2x_flat():
    x = jnp.arange(2 * 3 * 4 * 4, dtype=jnp.int8).reshape(2, 3, 16)
    got = neck_flat.upsample2x_flat(x, 4, 4)
    ref = _flat(jax.image.resize(
        _nhwc(x, 4, 4).astype(jnp.float32), (2, 8, 8, 3), "nearest"))
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(ref))


def test_gs_shuffle_flat_matches_nhwc():
    from rep_yolo_tpu.nn.blocks import gs_shuffle

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 6, 6, 8))
    got = neck_flat.gs_shuffle_flat(_flat(x))
    np.testing.assert_array_equal(np.asarray(got),
                                  np.asarray(_flat(gs_shuffle(x))))


@pytest.mark.slow
def test_neck_region_network_parity():
    """Tiny graph, q8 with the flat neck region ON vs OFF vs plain bf16:
    the neck region must track the backbone-only q8 path closely and
    stay within PTQ tolerance of the float deploy output."""
    import numpy as np

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
        B.set_neck_q8(False)
        out_backbone = deploy.predict(fused, x)
        B.set_neck_q8(True)
        out_neck = deploy.predict(fused, x)
    finally:
        B.set_cmajor_deploy(None)
        B.set_neck_q8(True)
    ref = np.asarray(ref, np.float32)
    a = np.asarray(out_backbone, np.float32)
    b = np.asarray(out_neck, np.float32)
    assert np.corrcoef(b.ravel(), ref.ravel())[0, 1] > 0.99
    assert np.corrcoef(b.ravel(), a.ravel())[0, 1] > 0.99

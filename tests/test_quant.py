"""int8 PTQ path: quant_conv numerics, calibration, end-to-end closeness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


import rep_yolo_tpu.nn.blocks as B
from rep_yolo_tpu.ops import quant

pytestmark = pytest.mark.slow  # full-graph jit compiles dominate

CFG = "cfg/rep_yolo_tiny_test.yaml"


@pytest.fixture(autouse=True)
def _quant_off():
    yield
    quant.disable()


def test_quant_conv_close_to_float():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 48), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 48, 64),
                          jnp.float32) * 0.05
    s_in = float(jnp.max(jnp.abs(x))) / 127.0
    y_q = quant.quant_conv(x, w, s_in, 1, 1)
    y_f = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = np.abs(np.asarray(y_q - y_f))
    scale = float(np.abs(np.asarray(y_f)).max())
    assert err.max() / scale < 0.05        # int8 quant noise, not a bug
    assert np.corrcoef(np.asarray(y_q).ravel(),
                       np.asarray(y_f).ravel())[0, 1] > 0.999


def test_selection_table():
    assert quant.default_select(3, 48, 48)
    assert quant.default_select(3, 512, 1024)
    assert not quant.default_select(3, 24, 24)          # neutral -> skip
    assert not quant.default_select(3, 256, 256)        # bf16 faster
    assert quant.default_select(1, 144, 48)
    assert not quant.default_select(1, 512, 512)        # wide pointwise


def test_calibrate_and_enable_end_to_end():
    from rep_yolo_tpu.models.model import RepYOLO

    model = RepYOLO.from_config(CFG)
    variables = model.init(jax.random.PRNGKey(0), img_size=64)
    deploy, fused = model.fuse(variables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3), jnp.float32)

    scales = quant.calibrate(deploy, fused, [x])
    assert scales and all(s > 0 for s in scales.values())
    assert any("conv" in p or "w" not in p for p in scales)

    y_f = deploy.predict(fused, x)
    # select everything eligible so the int8 path actually runs in this
    # tiny model (its channels are below the production thresholds)
    quant.enable(scales, select=lambda k, cin, cout: True)
    y_q = deploy.predict(fused, x)
    quant.disable()
    y_off = deploy.predict(fused, x)

    np.testing.assert_array_equal(np.asarray(y_off), np.asarray(y_f))
    rel = np.abs(np.asarray(y_q - y_f)) / (np.abs(np.asarray(y_f)) + 1.0)
    assert float(rel.mean()) < 0.05
    assert np.corrcoef(np.asarray(y_q).ravel(),
                       np.asarray(y_f).ravel())[0, 1] > 0.99


def test_grouped_convs_stay_float():
    # depthwise/grouped convs must never route through quant_conv
    assert quant.scale_for("any/path", 3, 32, 32, groups=2) is None
    quant.enable({"p": 1.0})
    assert quant.scale_for("p", 3, 64, 64, 4) is None
    assert quant.scale_for("missing", 3, 64, 64, 1) is None
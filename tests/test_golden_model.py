"""Full-model golden parity: 66-layer Rep-YOLO graph vs the PyTorch
reference — raw head maps, decoded predictions, and the fused deploy path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


from rep_yolo_tpu.models.model import RepYOLO
from rep_yolo_tpu.utils.torch_import import import_torch_state
from tests.conftest import load_golden

pytestmark = pytest.mark.slow  # full-graph jit compiles dominate


@pytest.fixture(scope="module")
def model_and_vars(golden_dir):
    g = load_golden("model_io.npz".replace(".npz", ""))
    state = load_golden("model_weights")
    model = RepYOLO.from_config("cfg/rep_yolo.yaml")
    x = jnp.asarray(g["x"].transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), img_size=256)
    variables = import_torch_state(variables, state)
    return model, variables, g, x


def test_strides_and_anchors(model_and_vars):
    model, _, g, _ = model_and_vars
    np.testing.assert_allclose(model.strides, g["strides"])
    np.testing.assert_allclose(
        model.anchors_grid, g["anchors_norm"], rtol=1e-6)


def test_raw_maps_match(model_and_vars):
    model, variables, g, x = model_and_vars
    maps = model.apply(variables, x, train=False)
    for i, m in enumerate(maps):
        ours = np.asarray(m).transpose(0, 3, 1, 2, 4)  # (B,H,W,na,no)->(B,na,H,W,no)
        np.testing.assert_allclose(ours, g[f"raw{i}"], rtol=2e-3, atol=2e-4,
                                   err_msg=f"level {i}")


def test_decoded_match(model_and_vars):
    model, variables, g, x = model_and_vars
    z = model.predict(variables, x)
    np.testing.assert_allclose(np.asarray(z), g["z"], rtol=2e-3, atol=5e-3)


def test_fused_deploy_match(model_and_vars):
    model, variables, g, x = model_and_vars
    deploy_model, fused = model.fuse(variables)
    zf = deploy_model.predict(fused, x)
    # reference fused-vs-train itself drifts at ~1e-3; compare to its fused out
    np.testing.assert_allclose(np.asarray(zf), g["zf"], rtol=5e-3, atol=2e-2)
    # and train-mode vs our fused should agree tightly
    z = model.predict(variables, x)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(z),
                               rtol=5e-3, atol=2e-2)

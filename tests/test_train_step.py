"""Train-step integration tests on a virtual 8-device CPU mesh: sharded
step runs, loss decreases on a fixed batch, EMA/optimizer state update,
augmentation pipeline produces sane outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from rep_yolo_tpu.data.augment import AugmentConfig, augment_batch
from rep_yolo_tpu.models.model import RepYOLO
from rep_yolo_tpu.parallel.mesh import make_mesh
from rep_yolo_tpu.train import optim as optim_lib
from rep_yolo_tpu.train.loss import LossConfig
from rep_yolo_tpu.train.trainer import create_train_state, make_train_step

pytestmark = pytest.mark.slow  # full-graph jit compiles dominate

CFG = "cfg/rep_yolo_tiny_test.yaml"
SIZE = 64
M = 8


@pytest.fixture(scope="module")
def setup():
    model = RepYOLO.from_config(CFG)
    variables = model.init(jax.random.PRNGKey(0), img_size=SIZE)
    loss_cfg = LossConfig(nc=1)
    opt_cfg = optim_lib.OptimConfig(epochs=30, nb=10, lr0=0.01,
                                    warmup_epochs=0, warmup_floor=0)
    step = make_train_step(model, loss_cfg, opt_cfg, SIZE, use_ota=True)
    return model, variables, step


def _batch(n):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 1, (n, SIZE, SIZE, 3)).astype(np.float32)
    hw = np.full((n, 2), SIZE, np.float32)
    labels = np.zeros((n, M, 5), np.float32)
    labels[:, 0] = [0.0, 0.5, 0.5, 0.3, 0.3]
    labels[:, 1] = [0.0, 0.25, 0.25, 0.15, 0.2]
    mask = np.zeros((n, M), bool)
    mask[:, :2] = True
    return (jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labels),
            jnp.asarray(mask))


def test_mesh_sharded_train_step(setup):
    model, variables, step = setup
    assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))

    state = create_train_state(variables, jax.random.PRNGKey(1))
    state = jax.device_put(state, repl)
    images, hw, labels, mask = _batch(8)
    images = jax.device_put(images, shard)
    hw = jax.device_put(hw, shard)
    labels = jax.device_put(labels, shard)
    mask = jax.device_put(mask, shard)

    jitted = jax.jit(step, in_shardings=(repl, shard, shard, shard, shard),
                     out_shardings=(repl, repl))
    state2, comps = jitted(state, images, hw, labels, mask)
    assert np.isfinite(float(comps["total"]))
    assert int(state2.opt.step) == 1
    assert int(state2.ema.updates) == 1
    # params actually changed
    delta = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).sum()),
                     state.params, state2.params))
    assert delta > 0


def test_loss_decreases_overfit(setup):
    model, variables, step = setup
    state = create_train_state(variables, jax.random.PRNGKey(1))
    images, hw, labels, mask = _batch(4)
    jitted = jax.jit(step)
    losses = []
    for _ in range(8):
        state, comps = jitted(state, images, hw, labels, mask)
        losses.append(float(comps["total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no learning: {losses}"


def test_augment_batch_shapes_and_ranges():
    rng = np.random.default_rng(0)
    B, S = 4, 64
    images = rng.integers(0, 255, (B, S, S, 3)).astype(np.float32)
    hw = np.stack([np.full(B, S * 0.8), np.full(B, S * 0.6)], 1).astype(
        np.float32)
    labels = np.zeros((B, M, 5), np.float32)
    labels[:, 0] = [0.0, 0.5, 0.5, 0.5, 0.5]
    mask = np.zeros((B, M), bool)
    mask[:, 0] = True
    cfg = AugmentConfig(img_size=S, max_labels=16)
    out = jax.jit(lambda *a: augment_batch(*a, cfg))(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labels),
        jnp.asarray(mask), jax.random.PRNGKey(0))
    assert out.images.shape == (B, S, S, 3)
    assert out.labels.shape == (B, 16, 5)
    assert float(out.images.min()) >= 0.0
    assert float(out.images.max()) <= 1.0
    lab = np.asarray(out.labels)
    msk = np.asarray(out.mask)
    assert (lab[msk][:, 1:] >= 0).all() and (lab[msk][:, 1:] <= 1).all()


def test_cli_train_mesh_smoke(tmp_path):
    """The training CLI jits its step over the full 8-device mesh (DDP
    analog, reference train.py:249-292,610-612): smoke 1 epoch of
    synthetic data sharded batch-over-devices, with eval + checkpoint."""
    from rep_yolo_tpu.cli.train import main

    out_dir = main(["--data", "synthetic:8", "--cfg", CFG, "--epochs", "1",
                    "--batch-size", "8", "--img-size", "64",
                    "--max-labels", "8", "--devices", "8", "--no-ota",
                    "--no-augment", "--project", str(tmp_path),
                    "--eval-every", "1"])
    assert (out_dir / "results.txt").exists()
    assert (out_dir / "last.json").exists()

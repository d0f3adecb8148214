"""Reparameterization property test: |f_train(x; eval) - f_deploy(x)| < eps
on our own randomly-initialized full model (the property the reference
relies on but never asserts — SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.models.model import RepYOLO


def test_full_model_fuse_equivalence():
    model = RepYOLO.from_config("cfg/rep_yolo.yaml")
    rng = jax.random.PRNGKey(42)
    variables = model.init(rng, img_size=128)
    # randomize BN stats so folding is non-trivial
    def jitter(path, x):
        name = path[-1].key
        k = jax.random.fold_in(rng, hash(tuple(p.key for p in path)) % (2**31))
        if name == "mean":
            return 0.3 * jax.random.normal(k, x.shape)
        if name == "var":
            return 0.5 + jax.random.uniform(k, x.shape)
        return x
    variables = {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map_with_path(
            jitter, variables["batch_stats"]),
    }

    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 128, 128, 3))
    z_train = model.predict(variables, x)
    deploy, fused = model.fuse(variables)
    z_deploy = deploy.predict(fused, x)
    np.testing.assert_allclose(np.asarray(z_deploy), np.asarray(z_train),
                               rtol=5e-3, atol=2e-2)

"""Fused Pallas axial attention == XLA einsum path (CPU interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import rep_yolo_tpu.nn.blocks as B


@pytest.fixture(autouse=True)
def _restore_flag():
    yield
    B.set_fused_attention(False)


def _run_both(module_cls, c1, h, w, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, h, w, c1), jnp.float32)
    mod = module_cls(c1)
    variables = mod.init(jax.random.PRNGKey(1), x, False)
    # gamma init is zero (output == residual); give it a real value so the
    # attention branch actually contributes
    variables = jax.tree.map(lambda a: a, variables)
    params = dict(variables["params"])
    params["gamma"] = jnp.array([0.7], jnp.float32)
    variables = {**variables, "params": params}

    B.set_fused_attention(False)
    y_ref = mod.apply(variables, x, False)
    B.set_fused_attention(True)
    y_fused = mod.apply(variables, x, False)
    return np.asarray(y_ref), np.asarray(y_fused)


def test_criss_cross_fused_matches_xla():
    y_ref, y_fused = _run_both(B.CrissCrossAttention, c1=16, h=12, w=10)
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-5, rtol=1e-4)


def test_vertical_fused_matches_xla():
    y_ref, y_fused = _run_both(B.VerticalAttention, c1=16, h=10, w=12)
    np.testing.assert_allclose(y_fused, y_ref, atol=2e-5, rtol=1e-4)


def test_ccva_block_fused_matches_xla():
    c1 = 32
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, c1), jnp.float32)
    mod = B.CCVA(c1)
    variables = mod.init(jax.random.PRNGKey(3), x, False)

    B.set_fused_attention(False)
    y_ref = mod.apply(variables, x, False)
    B.set_fused_attention(True)
    y_fused = mod.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=2e-5, rtol=1e-4)


def test_fits_guard():
    from rep_yolo_tpu.ops.pallas import axial_attention as ax
    assert ax.fits(80, 80, 64)        # 640px scales fit
    assert ax.fits(160, 160, 64)      # 1280px P6 fits with 8-row tiles
    assert not ax.fits(320, 320, 64)  # beyond-VMEM sizes fall back to XLA


def test_train_mode_ignores_flag():
    # train path must keep the XLA implementation (dropout + golden grads)
    c1 = 16
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, c1), jnp.float32)
    mod = B.CrissCrossAttention(c1)
    variables = mod.init(jax.random.PRNGKey(5), x, False)
    B.set_fused_attention(True)
    y, _ = mod.apply(variables, x, True, mutable=["batch_stats"],
                     rngs={"dropout": jax.random.PRNGKey(6)})
    assert y.shape == x.shape


def _randomize_stats(variables, seed=7):
    """Non-trivial BN running stats so the v2 affine fold is exercised."""
    rng = np.random.default_rng(seed)
    stats = jax.tree.map(
        lambda a: jnp.asarray(
            rng.uniform(0.5, 1.5, a.shape).astype(np.float32))
        if a.ndim >= 1 else a, variables["batch_stats"])
    return {**variables, "batch_stats": stats}


def _run_both_deploy(module_cls, c1, h, w, seed=0):
    """v2 absorbed-projection kernels vs the regular deploy path: the
    fused branch declares the SAME param tree via _NestedConvParams /
    _NestedBNParams, so one set of variables drives both."""
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, h, w, c1),
                          jnp.float32)
    mod = module_cls(c1, deploy=True)
    variables = mod.init(jax.random.PRNGKey(1), x, False)
    variables = _randomize_stats(variables)
    params = dict(variables["params"])
    params["gamma"] = jnp.array([0.7], jnp.float32)
    variables = {**variables, "params": params}

    B.set_fused_attention(False)
    y_ref = mod.apply(variables, x, False)
    B.set_fused_attention(True)
    y_fused = mod.apply(variables, x, False)
    return np.asarray(y_ref), np.asarray(y_fused)


def test_criss_cross_fused_x_matches_deploy():
    y_ref, y_fused = _run_both_deploy(B.CrissCrossAttention, c1=16, h=12,
                                      w=10)
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-4, rtol=1e-4)


def test_vertical_fused_x_matches_deploy():
    y_ref, y_fused = _run_both_deploy(B.VerticalAttention, c1=16, h=10,
                                      w=12)
    np.testing.assert_allclose(y_fused, y_ref, atol=1e-4, rtol=1e-4)


def test_ccva_block_fused_x_matches_deploy():
    c1 = 32
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, c1), jnp.float32)
    mod = B.CCVA(c1, deploy=True)
    variables = mod.init(jax.random.PRNGKey(3), x, False)
    variables = _randomize_stats(variables)

    B.set_fused_attention(False)
    y_ref = mod.apply(variables, x, False)
    B.set_fused_attention(True)
    y_fused = mod.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-4, rtol=1e-4)

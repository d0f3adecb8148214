"""Reparameterization property test: |f_train(x; eval) - f_deploy(x)| < eps
on our own randomly-initialized full model (the property the reference
relies on but never asserts — SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.models.model import RepYOLO


def _fuse_equivalence(cfg: str, img_size: int):
    model = RepYOLO.from_config(cfg)
    rng = jax.random.PRNGKey(42)
    variables = model.init(rng, img_size=img_size)
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

    x = jax.random.uniform(jax.random.PRNGKey(7), (1, img_size, img_size, 3))
    z_train = model.predict(variables, x)
    deploy, fused = model.fuse(variables)
    z_deploy = deploy.predict(fused, x)
    np.testing.assert_allclose(np.asarray(z_deploy), np.asarray(z_train),
                               rtol=5e-3, atol=2e-2)


def test_tiny_model_fuse_equivalence():
    """Fast-suite guard: same property on the reduced test graph (same
    block vocabulary as the flagship — RepS/DER/GSConv/SPPCSPC/CCVA/...)."""
    _fuse_equivalence("cfg/rep_yolo_tiny_test.yaml", 64)


@pytest.mark.slow
def test_full_model_fuse_equivalence():
    """Full 66-layer flagship graph (207 s warm on the 1-core CPU —
    trace-bound, so it lives in the slow suite)."""
    _fuse_equivalence("cfg/rep_yolo.yaml", 128)


def test_s2d_stride2_conv_exact():
    """The thin-channel stride-2 stem decomposition (space-to-depth +
    2x2 conv, nn/blocks._s2d_stride2_conv) is exact vs the direct
    stride-2 3x3 'same' conv for every geometry ConvUnit routes to it."""
    from rep_yolo_tpu.nn.blocks import _s2d_stride2_conv

    for C, O, H, W in [(3, 48, 64, 64), (3, 48, 32, 96), (8, 16, 16, 16)]:
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, H, W, C)) * 2 - 1
        w = jax.random.uniform(jax.random.PRNGKey(1), (3, 3, C, O)) - 0.5
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST)
        y = _s2d_stride2_conv(x, w, jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_dense_grouped_conv_exact():
    """The block-diagonal dense rewrite of grouped/depthwise convs
    (nn/blocks._dense_grouped_weights, DENSE_GROUPED_MAX_C1 gate) is
    exact vs feature_group_count for depthwise (g == c1 == c2, the
    reference's GSConv 5x5, models/common.py) and general grouped
    shapes."""
    import rep_yolo_tpu.nn.blocks as blocks_lib
    from rep_yolo_tpu.nn.blocks import ConvUnit

    for c1, c2, g, k, s in [(32, 32, 32, 5, 1), (64, 64, 64, 5, 1),
                            (32, 64, 4, 3, 2), (24, 24, 24, 3, 1)]:
        x = jax.random.uniform(jax.random.PRNGKey(g), (2, 16, 16, c1)) - 0.5
        m = ConvUnit(c2, k=k, s=s, g=g)
        v = m.init(jax.random.PRNGKey(c2), x)
        assert c1 <= blocks_lib.DENSE_GROUPED_MAX_C1  # routes to dense
        y_dense = m.apply(v, x)
        orig = blocks_lib.DENSE_GROUPED_MAX_C1
        blocks_lib.set_dense_grouped(0)
        try:
            y_group = m.apply(v, x)
        finally:
            blocks_lib.set_dense_grouped(orig)
        np.testing.assert_allclose(np.asarray(y_dense), np.asarray(y_group),
                                   rtol=1e-6, atol=1e-6)

"""Mosaic-9, copy-paste (pastein) and cutout augmentations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rep_yolo_tpu.data.augment import (
    AugmentConfig, augment_batch, cutout, paste_in)


def _batch(B=4, S=64, M=8, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.uniform(0, 255, (B, S, S, 3)).astype(np.float32)
    hw = np.full((B, 2), S, np.float32)
    labels = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    for b in range(B):
        labels[b, 0] = [0, 0.5, 0.5, 0.25, 0.25]
        labels[b, 1] = [0, 0.25, 0.3, 0.2, 0.2]
        mask[b, :2] = True
    return (jnp.asarray(imgs), jnp.asarray(hw), jnp.asarray(labels),
            jnp.asarray(mask))


@pytest.mark.slow
def test_augment_batch_with_mosaic9_and_pastein():
    # ~65 s warm: jits the full mosaic9+paste_in+cutout augment program
    imgs, hw, labels, mask = _batch()
    cfg = AugmentConfig(img_size=64, mosaic9=0.5, paste_in=0.5,
                        cutout=0.3, max_labels=16)
    out = jax.jit(lambda *a: augment_batch(*a, cfg=cfg))(
        imgs, hw, labels, mask, jax.random.PRNGKey(0))
    assert out.images.shape == (4, 64, 64, 3)
    assert out.labels.shape == (4, 16, 5)
    assert jnp.all(jnp.isfinite(out.images))
    assert float(out.images.min()) >= 0.0
    assert float(out.images.max()) <= 1.0
    # labels normalized and masked consistently
    assert float(jnp.where(out.mask[..., None], out.labels, 0).max()) <= 1.5
    assert bool(out.mask.any())


def test_separable_warp_matches_gather():
    """The separable (matmul) warp fast path is numerically equivalent to
    the gather formulation for diagonal-affine M (default hyps)."""
    import dataclasses

    from rep_yolo_tpu.data import augment as A

    imgs, hw, labels, mask = _batch(B=4, S=64)
    cfg = AugmentConfig(img_size=64, max_labels=16)  # degrees=shear=persp=0
    assert A._is_separable(cfg)
    key = jax.random.PRNGKey(7)
    k_center, k_aff = jax.random.split(key)
    S = 64
    center = jnp.floor(jax.random.uniform(k_center, (2,), minval=S / 2,
                                          maxval=1.5 * S))
    M = A._affine_matrix(k_aff, S, cfg, canvas=2 * S)
    img_gather = A._warp(A._mosaic_sample_fn(imgs[:4], hw[:4], center),
                         M, S, False)
    img_sep = A._warp_separable(A._mosaic_canvas(imgs[:4], hw[:4], center),
                                M, S)
    np.testing.assert_allclose(np.asarray(img_sep), np.asarray(img_gather),
                               rtol=1e-4, atol=1e-2)


def test_letterbox_separable_geometry():
    from rep_yolo_tpu.data.augment import letterbox_batch

    # content 32x48 inside a 64-padded frame, letterbox to 64
    img = np.full((64, 64, 3), 200.0, np.float32)
    img[32:] = 0.0   # below-content area (padding region in the loader)
    img[:, 48:] = 0.0
    out, r, pad = letterbox_batch(jnp.asarray(img[None]),
                                  jnp.asarray([[32.0, 48.0]]), 64)
    out = np.asarray(out[0]) * 255
    assert abs(float(r[0]) - 1.0) < 1e-6          # scaleup=False keeps r=1
    pw, ph = np.asarray(pad[0])
    assert pw == 8 and ph == 16
    # content is centered; corners are pad gray 114
    assert abs(out[32, 32].mean() - 200.0) < 1.0
    assert abs(out[0, 0].mean() - 114.0) < 1.0
    assert abs(out[63, 63].mean() - 114.0) < 1.0


def test_cutout_drops_obscured_labels():
    S = 64
    img = jnp.full((S, S, 3), 100.0)
    # one label covering a small region
    xyxy = jnp.asarray([[10.0, 10.0, 20.0, 20.0], [40.0, 40.0, 60.0, 60.0]])
    valid = jnp.asarray([True, True])
    img2, valid2 = cutout(img, xyxy, valid, jax.random.PRNGKey(3))
    assert img2.shape == img.shape
    # image actually modified somewhere
    assert float(jnp.abs(img2 - img).sum()) > 0
    # validity never increases
    assert not bool((~valid & valid2).any())


def test_paste_in_adds_labels_and_pixels():
    S = 64
    img = jnp.zeros((S, S, 3))
    partner = jnp.full((S, S, 3), 200.0)
    cls = jnp.zeros((4,))
    xyxy = jnp.zeros((4, 4))
    valid = jnp.zeros((4,), bool)
    p_cls = jnp.ones((4,))
    p_xyxy = jnp.asarray([[8.0, 8.0, 24.0, 24.0]] * 4)
    p_valid = jnp.ones((4,), bool)
    im2, c2, b2, v2 = paste_in(img, cls, xyxy, valid, partner, p_cls,
                               p_xyxy, p_valid, jax.random.PRNGKey(1))
    assert c2.shape[0] == 4 + 8
    assert bool(v2[4:].any())          # at least one paste landed
    assert float(im2.sum()) > 0        # partner pixels copied in
    # pasted boxes lie inside the canvas
    b_new = b2[4:][np.asarray(v2[4:])]
    assert float(b_new.min()) >= 0 and float(b_new.max()) <= S

"""On-device augmentation: fused mosaic-4 + random-affine warp, HSV, flips,
mixup — the TPU-native replacement for the reference's OpenCV pipeline
(reference utils/datasets.py:534-629, load_mosaic :708-764,
random_perspective :1017-1103, augment_hsv :683-694).

TPU-first design: instead of materializing the 2s x 2s mosaic canvas and
then warping it (two memory-bound passes over 4x the pixels), the mosaic
placement and the affine warp are *composed*: each output pixel maps
through the inverse affine to a virtual canvas coordinate, which resolves
to (tile, source pixel) — one fused bilinear gather at s x s resolution.
Everything is batched, static-shape, and jit-able; randomness comes from
explicit PRNG keys.

Inputs are the loader's fixed-shape tensors:
- images: (B, S, S, 3) uint8/float, each a longest-side-S resize padded
  bottom/right to S x S;
- hw:     (B, 2) float true (h, w) of the content within the pad;
- labels: (B, M, 5) [cls, xc, yc, w, h] normalized to the *content* (h,w);
- mask:   (B, M) bool validity.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

PAD_VALUE = 114.0  # border gray (reference utils/datasets.py:721,1057)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    img_size: int = 640
    degrees: float = 0.0
    translate: float = 0.2
    scale: float = 0.9
    shear: float = 0.0
    perspective: float = 0.0
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0
    mosaic9: float = 0.2     # P(use 9-mosaic | mosaic) (reference :572)
    mixup: float = 0.15
    paste_in: float = 0.15   # copy-paste prob (reference hyp paste_in)
    cutout: float = 0.0      # reference defines cutout but ships it off
    max_labels: int = 120


class Batch(NamedTuple):
    images: jax.Array   # (B, S, S, 3) float in [0,1]
    labels: jax.Array   # (B, M, 5) [cls, xc, yc, w, h] normalized
    mask: jax.Array     # (B, M) bool


def _affine_matrix(key: jax.Array, size: int, cfg: AugmentConfig,
                   canvas: int) -> jax.Array:
    """Random 3x3 forward transform M = T @ S @ R @ P @ C
    (reference utils/datasets.py:1026-1054). `canvas` is the input extent
    (2s for mosaic, s otherwise); output extent is `size`.
    """
    kp, ka, ks, ksh1, ksh2, ktx, kty = jax.random.split(key, 7)

    C = jnp.eye(3).at[0, 2].set(-canvas / 2).at[1, 2].set(-canvas / 2)

    P = jnp.eye(3)
    P = P.at[2, 0].set(jax.random.uniform(
        kp, (), minval=-cfg.perspective, maxval=cfg.perspective))
    P = P.at[2, 1].set(jax.random.uniform(
        jax.random.fold_in(kp, 1), (), minval=-cfg.perspective,
        maxval=cfg.perspective))

    a = jax.random.uniform(ka, (), minval=-cfg.degrees, maxval=cfg.degrees)
    a = a * math.pi / 180.0
    s = jax.random.uniform(ks, (), minval=1 - cfg.scale, maxval=1.1 + cfg.scale)
    # cv2.getRotationMatrix2D(angle, center=0, scale) convention
    R = jnp.asarray([[jnp.cos(a) * s, jnp.sin(a) * s, 0.0],
                     [-jnp.sin(a) * s, jnp.cos(a) * s, 0.0],
                     [0.0, 0.0, 1.0]])

    sh1 = jnp.tan(jax.random.uniform(ksh1, (), minval=-cfg.shear,
                                     maxval=cfg.shear) * math.pi / 180)
    sh2 = jnp.tan(jax.random.uniform(ksh2, (), minval=-cfg.shear,
                                     maxval=cfg.shear) * math.pi / 180)
    S = jnp.eye(3).at[0, 1].set(sh1).at[1, 0].set(sh2)

    tx = jax.random.uniform(ktx, (), minval=0.5 - cfg.translate,
                            maxval=0.5 + cfg.translate) * size
    ty = jax.random.uniform(kty, (), minval=0.5 - cfg.translate,
                            maxval=0.5 + cfg.translate) * size
    T = jnp.eye(3).at[0, 2].set(tx).at[1, 2].set(ty)

    return T @ S @ R @ P @ C


def _mosaic_sample_fn(imgs4: jax.Array, hw4: jax.Array, center: jax.Array):
    """Return f(cy, cx) -> (value (..., 3), in_bounds) sampling the virtual
    2s x 2s mosaic canvas at integer coords (reference load_mosaic
    placement, utils/datasets.py:719-736)."""
    S = imgs4.shape[1]
    yc, xc = center[0], center[1]
    h = hw4[:, 0]
    w = hw4[:, 1]

    def sample(cy, cx):
        right = (cx >= xc).astype(jnp.int32)
        bottom = (cy >= yc).astype(jnp.int32)
        tile = bottom * 2 + right                       # 0 TL, 1 TR, 2 BL, 3 BR
        th = h[tile]
        tw = w[tile]
        # content origin in canvas coords per tile
        ox = jnp.where(right == 1, xc, xc - tw)
        oy = jnp.where(bottom == 1, yc, yc - th)
        sx = cx - ox
        sy = cy - oy
        ok = (sx >= 0) & (sx < tw) & (sy >= 0) & (sy < th)
        sxc = jnp.clip(sx, 0, S - 1).astype(jnp.int32)
        syc = jnp.clip(sy, 0, S - 1).astype(jnp.int32)
        val = imgs4[tile, syc, sxc]
        return jnp.where(ok[..., None], val, PAD_VALUE), ok

    return sample


def _single_sample_fn(img: jax.Array, hw: jax.Array, size: int,
                      r: jax.Array):
    """Sampler for the non-mosaic path: the image letterboxed (centered) to
    size x size acts as the canvas (reference utils/datasets.py:562-568).
    `r` is the resize ratio (pass min(r,1) for scaleup=False eval)."""
    S = img.shape[0]
    h = hw[0]
    w = hw[1]
    nh = jnp.round(h * r)
    nw = jnp.round(w * r)
    oy = jnp.round((size - nh) / 2.0)
    ox = jnp.round((size - nw) / 2.0)

    def sample(cy, cx):
        sy = (cy - oy) / r
        sx = (cx - ox) / r
        ok = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
        syc = jnp.clip(sy, 0, S - 1).astype(jnp.int32)
        sxc = jnp.clip(sx, 0, S - 1).astype(jnp.int32)
        val = img[syc, sxc]
        return jnp.where(ok[..., None], val, PAD_VALUE), ok

    return sample


def _is_separable(cfg: AugmentConfig) -> bool:
    """The default hyps (degrees=shear=perspective=0) make every warp a
    diagonal affine — separable into two interpolation matmuls that run on
    the MXU instead of per-pixel gathers (which cost ~600 ms/step on TPU)."""
    return (cfg.degrees == 0.0 and cfg.shear == 0.0
            and cfg.perspective == 0.0)


def _interp_matrix(coords: jax.Array, src_size: int,
                   bound: jax.Array | None = None):
    """Dense bilinear interpolation matrix R (out, src) for 1-D source
    coordinates `coords` (out,): R @ v == bilinear sample of v at coords.
    Out-of-range taps get zero weight; `bound` optionally tightens the
    valid source extent below src_size (letterbox content). Also returns
    the per-row weight sum (for blending the PAD_VALUE outside)."""
    i0 = jnp.floor(coords)
    f = coords - i0
    src = jnp.arange(src_size, dtype=jnp.float32)[None, :]
    hi = jnp.float32(src_size) if bound is None else bound
    r = jnp.zeros((coords.shape[0], src_size), jnp.float32)
    for d, wgt in ((0, 1.0 - f), (1, f)):
        idx = i0 + d
        ok = (idx >= 0) & (idx < hi)
        r = r + jnp.where((src == idx[:, None]) & ok[:, None],
                          wgt[:, None], 0.0)
    return r, r.sum(axis=1)


def _warp_separable(canvas: jax.Array, M: jax.Array, size: int) -> jax.Array:
    """Inverse-warp for diagonal-affine M: out = Ry @ canvas @ Rx^T with
    PAD_VALUE blended where the bilinear footprint leaves the canvas.
    Bit-compatible with the gather path for the same M."""
    Minv = jnp.linalg.inv(M)
    out_idx = jnp.arange(size, dtype=jnp.float32)
    cx = Minv[0, 0] * out_idx + Minv[0, 2]
    cy = Minv[1, 1] * out_idx + Minv[1, 2]
    Hc, Wc = canvas.shape[0], canvas.shape[1]
    ry, sy = _interp_matrix(cy, Hc)
    rx, sx = _interp_matrix(cx, Wc)
    tmp = jnp.einsum("yh,hwc->ywc", ry, canvas)
    out = jnp.einsum("ywc,xw->yxc", tmp, rx)
    cover = sy[:, None] * sx[None, :]
    return out + PAD_VALUE * (1.0 - cover)[..., None]


def _mosaic_canvas(imgs4: jax.Array, hw4: jax.Array,
                   center: jax.Array) -> jax.Array:
    """Materialize the 2s x 2s four-tile mosaic canvas (reference
    load_mosaic placement, utils/datasets.py:719-736) via rolls + masks —
    no scatter, no gather."""
    S = imgs4.shape[1]
    yc, xc = center[0], center[1]
    cy = jax.lax.broadcasted_iota(jnp.float32, (2 * S, 2 * S), 0)
    cx = jax.lax.broadcasted_iota(jnp.float32, (2 * S, 2 * S), 1)
    canvas = jnp.full((2 * S, 2 * S, 3), PAD_VALUE, imgs4.dtype)
    for t in range(4):
        right = t % 2
        bottom = t // 2
        h = hw4[t, 0]
        w = hw4[t, 1]
        oy = jnp.where(bottom == 1, yc, yc - h)
        ox = jnp.where(right == 1, xc, xc - w)
        padded = jnp.pad(imgs4[t], ((0, S), (0, S), (0, 0)))
        shifted = jnp.roll(padded, (oy.astype(jnp.int32),
                                    ox.astype(jnp.int32)), axis=(0, 1))
        mask = (cy >= oy) & (cy < oy + h) & (cx >= ox) & (cx < ox + w)
        canvas = jnp.where(mask[..., None], shifted, canvas)
    return canvas


def _warp(sample_fn, M: jax.Array, size: int, perspective: bool) -> jax.Array:
    """Inverse-warp the canvas through M with bilinear filtering: one fused
    gather pass over the s x s output."""
    Minv = jnp.linalg.inv(M)
    ys = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)
    ones = jnp.ones_like(xs)
    # cv2.warpAffine maps dst->src with Minv on pixel centers
    cx = Minv[0, 0] * xs + Minv[0, 1] * ys + Minv[0, 2]
    cy = Minv[1, 0] * xs + Minv[1, 1] * ys + Minv[1, 2]
    if perspective:
        cz = Minv[2, 0] * xs + Minv[2, 1] * ys + Minv[2, 2]
        cx = cx / cz
        cy = cy / cz

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    fx = cx - x0
    fy = cy - y0
    acc = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            v, _ = sample_fn(y0 + dy, x0 + dx)
            wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy))[..., None]
            acc = acc + v * wgt
    return acc


def _transform_labels(xyxy: jax.Array, valid: jax.Array, M: jax.Array,
                      size: int, scale_s: jax.Array,
                      perspective: bool) -> tuple[jax.Array, jax.Array]:
    """Warp xyxy boxes by M, clip, and apply box_candidates filtering
    (reference utils/datasets.py:1083-1101, box_candidates :1106-1111)."""
    n = xyxy.shape[0]
    corners = jnp.stack([
        xyxy[:, 0], xyxy[:, 1], xyxy[:, 2], xyxy[:, 3],
        xyxy[:, 0], xyxy[:, 3], xyxy[:, 2], xyxy[:, 1],
    ], axis=1).reshape(n * 4, 2)
    pts = jnp.concatenate([corners, jnp.ones((n * 4, 1))], axis=1) @ M.T
    if perspective:
        pts = pts[:, :2] / pts[:, 2:3]
    else:
        pts = pts[:, :2]
    pts = pts.reshape(n, 4, 2)
    new = jnp.concatenate([pts.min(axis=1), pts.max(axis=1)], axis=1)
    new = jnp.clip(new, 0.0, size)

    # box_candidates: pre-warp box scaled by s vs post-warp box
    w1 = (xyxy[:, 2] - xyxy[:, 0]) * scale_s
    h1 = (xyxy[:, 3] - xyxy[:, 1]) * scale_s
    w2 = new[:, 2] - new[:, 0]
    h2 = new[:, 3] - new[:, 1]
    eps = 1e-16
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    ok = (w2 > 2) & (h2 > 2) & (w2 * h2 / (w1 * h1 + eps) > 0.10) & (ar < 20)
    return new, valid & ok


def hsv_jitter(img: jax.Array, key: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """HSV gain jitter on [0,1] RGB (reference augment_hsv
    utils/datasets.py:683-694, float-exact instead of uint8 LUTs)."""
    gains = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    r = gains * jnp.asarray([cfg.hsv_h, cfg.hsv_s, cfg.hsv_v]) + 1.0

    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    d = maxc - minc
    s = jnp.where(maxc > 0, d / jnp.maximum(maxc, 1e-12), 0.0)
    rc, gc, bc = img[..., 0], img[..., 1], img[..., 2]
    safe_d = jnp.maximum(d, 1e-12)
    h = jnp.where(
        maxc == rc, (gc - bc) / safe_d,
        jnp.where(maxc == gc, 2.0 + (bc - rc) / safe_d,
                  4.0 + (rc - gc) / safe_d))
    h = (h / 6.0) % 1.0
    h = jnp.where(d <= 0, 0.0, h)

    h = (h * r[0]) % 1.0
    s = jnp.clip(s * r[1], 0.0, 1.0)
    v = jnp.clip(v * r[2], 0.0, 1.0)

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q]),
    ], axis=-1)
    return rgb


def _one_mosaic(imgs4, hw4, labels4, mask4, key, cfg: AugmentConfig):
    """One mosaic-4 + affine sample. imgs4 (4,S,S,3) float 0-255;
    labels4 (4,M,5) normalized to content; mask4 (4,M)."""
    S = cfg.img_size
    k_center, k_aff = jax.random.split(key)
    # yc, xc ~ U(s/2, 3s/2) with mosaic_border = -s/2 (reference :713)
    center = jax.random.uniform(k_center, (2,), minval=S / 2,
                                maxval=1.5 * S)
    center = jnp.floor(center)

    M = _affine_matrix(k_aff, S, cfg, canvas=2 * S)
    persp = cfg.perspective != 0.0
    if _is_separable(cfg):
        img = _warp_separable(_mosaic_canvas(imgs4, hw4, center), M, S)
    else:
        img = _warp(_mosaic_sample_fn(imgs4, hw4, center), M, S, persp)

    # labels: normalized xywh -> canvas xyxy with per-tile pad offsets
    h = hw4[:, 0][:, None]
    w = hw4[:, 1][:, None]
    yc, xc = center[0], center[1]
    right = jnp.asarray([0, 1, 0, 1], jnp.float32)[:, None]
    bottom = jnp.asarray([0, 0, 1, 1], jnp.float32)[:, None]
    padw = jnp.where(right == 1, xc, xc - w)
    padh = jnp.where(bottom == 1, yc, yc - h)
    cls = labels4[..., 0]
    bx = labels4[..., 1] * w
    by = labels4[..., 2] * h
    bw = labels4[..., 3] * w
    bh = labels4[..., 4] * h
    xyxy = jnp.stack([bx - bw / 2 + padw, by - bh / 2 + padh,
                      bx + bw / 2 + padw, by + bh / 2 + padh], axis=-1)
    xyxy = jnp.clip(xyxy.reshape(-1, 4), 0, 2 * S)      # (4M, 4)
    valid = mask4.reshape(-1)
    scale_s = M[0, 0] ** 2 + M[1, 0] ** 2               # |scale|^2 of R
    scale_s = jnp.sqrt(scale_s)
    new, valid = _transform_labels(xyxy, valid, M, S, scale_s, persp)
    cls = cls.reshape(-1)
    return img, cls, new, valid


def _mosaic9_sample_fn(imgs9: jax.Array, hw9: jax.Array):
    """Sampler over a 3s x 3s nine-tile canvas. The reference packs tiles
    tightly by content size around the center image
    (reference load_mosaic9, utils/datasets.py:767-891); here tiles sit on
    a uniform 3x3 grid of s-cells (content top-left per cell) — the same
    augmentation family with static shapes, since our inputs are already
    s-padded."""
    S = imgs9.shape[1]
    h = hw9[:, 0]
    w = hw9[:, 1]

    def sample(cy, cx):
        row = jnp.clip(cy // S, 0, 2).astype(jnp.int32)
        col = jnp.clip(cx // S, 0, 2).astype(jnp.int32)
        tile = row * 3 + col
        sx = cx - col * S
        sy = cy - row * S
        ok = (sx >= 0) & (sx < w[tile]) & (sy >= 0) & (sy < h[tile])
        sxc = jnp.clip(sx, 0, S - 1).astype(jnp.int32)
        syc = jnp.clip(sy, 0, S - 1).astype(jnp.int32)
        val = imgs9[tile, syc, sxc]
        return jnp.where(ok[..., None], val, PAD_VALUE), ok

    return sample


def _one_mosaic9(imgs9, hw9, labels9, mask9, key, cfg: AugmentConfig):
    """One mosaic-9 + affine sample: imgs9 (9,S,S,3), labels9 (9,M,5)."""
    S = cfg.img_size
    k_center, k_aff = jax.random.split(key)
    # random crop center on the 3s canvas (reference :873-878 crops
    # [yc:yc+2s, xc:xc+2s] then treats it like the 2s mosaic canvas)
    M = _affine_matrix(k_aff, S, cfg, canvas=3 * S)
    persp = cfg.perspective != 0.0
    if _is_separable(cfg):
        # 3x3 grid canvas: static s-cell offsets, content top-left per cell
        cy = jax.lax.broadcasted_iota(jnp.float32, (3 * S, 3 * S), 0)
        cx = jax.lax.broadcasted_iota(jnp.float32, (3 * S, 3 * S), 1)
        canvas = jnp.full((3 * S, 3 * S, 3), PAD_VALUE, imgs9.dtype)
        for t in range(9):
            oy, ox = (t // 3) * S, (t % 3) * S
            tile = jnp.pad(imgs9[t], ((oy, 2 * S - oy),
                                      (ox, 2 * S - ox), (0, 0)))
            mask = (cy >= oy) & (cy < oy + hw9[t, 0]) \
                & (cx >= ox) & (cx < ox + hw9[t, 1])
            canvas = jnp.where(mask[..., None], tile, canvas)
        img = _warp_separable(canvas, M, S)
    else:
        img = _warp(_mosaic9_sample_fn(imgs9, hw9), M, S, persp)

    h = hw9[:, 0][:, None]
    w = hw9[:, 1][:, None]
    rows = (jnp.arange(9) // 3).astype(jnp.float32)[:, None]
    cols = (jnp.arange(9) % 3).astype(jnp.float32)[:, None]
    padw = cols * S
    padh = rows * S
    cls = labels9[..., 0]
    bx = labels9[..., 1] * w
    by = labels9[..., 2] * h
    bw = labels9[..., 3] * w
    bh = labels9[..., 4] * h
    xyxy = jnp.stack([bx - bw / 2 + padw, by - bh / 2 + padh,
                      bx + bw / 2 + padw, by + bh / 2 + padh], axis=-1)
    xyxy = jnp.clip(xyxy.reshape(-1, 4), 0, 3 * S)      # (9M, 4)
    valid = mask9.reshape(-1)
    scale_s = jnp.sqrt(M[0, 0] ** 2 + M[1, 0] ** 2)
    new, valid = _transform_labels(xyxy, valid, M, S, scale_s, persp)
    return img, cls.reshape(-1), new, valid


# cutout box-scale schedule (reference utils/datasets.py:1140):
# 1x 1/2, 2x 1/4, 4x 1/8, 8x 1/16, 16x 1/32
_CUTOUT_SCALES = [0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 \
    + [0.03125] * 16


def cutout(img: jax.Array, xyxy: jax.Array, valid: jax.Array,
           key: jax.Array):
    """Random-erase augmentation (reference utils/datasets.py:1133-1158):
    31 random boxes filled with random gray-ish colors; labels whose
    intersection-over-area with any cut box exceeds 0.60 are dropped.
    img: (S,S,3) float 0-255; xyxy in pixels."""
    S = img.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)

    for i, sc in enumerate(_CUTOUT_SCALES):
        k1, k2, k3, key = jax.random.split(jax.random.fold_in(key, i), 4)
        mh = jax.random.randint(k1, (), int(S * sc * 0.5),
                                max(int(S * sc), 1) + 1)
        mw = jax.random.randint(k2, (), int(S * sc * 0.5),
                                max(int(S * sc), 1) + 1)
        cy = jax.random.randint(k3, (2,), 0, S)
        x1 = jnp.clip(cy[1] - mw // 2, 0, S)
        y1 = jnp.clip(cy[0] - mh // 2, 0, S)
        x2 = jnp.clip(x1 + mw, 0, S)
        y2 = jnp.clip(y1 + mh, 0, S)
        box_mask = (ys >= y1) & (ys < y2) & (xs >= x1) & (xs < x2)
        color = jax.random.randint(jax.random.fold_in(key, 7 * i), (3,),
                                   64, 191).astype(img.dtype)
        img = jnp.where(box_mask[..., None], color, img)
        # ioa of the cut box with each label (reference bbox_ioa :1147-1153)
        ix1 = jnp.maximum(xyxy[:, 0], x1)
        iy1 = jnp.maximum(xyxy[:, 1], y1)
        ix2 = jnp.minimum(xyxy[:, 2], x2)
        iy2 = jnp.minimum(xyxy[:, 3], y2)
        inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
        area = jnp.clip((xyxy[:, 2] - xyxy[:, 0])
                        * (xyxy[:, 3] - xyxy[:, 1]), 1e-9, None)
        valid = valid & ((inter / area) < 0.60)
    return img, valid


def paste_in(img: jax.Array, cls, xyxy, valid, partner_img: jax.Array,
             p_cls, p_xyxy, p_valid, key: jax.Array, attempts: int = 8):
    """Device copy-paste (reference `pastein`, utils/datasets.py:1161-1198):
    paste up to `attempts` labeled regions from a partner image at random
    locations, skipping pastes that overlap existing labels (IoA >= 0.3).
    The reference pastes from a sample-label pool; here the pool is the
    mosaic partner image in the same batch — same augmentation family with
    static shapes. Appends `attempts` label slots (invalid when skipped)."""
    S = img.shape[0]
    ys = jax.lax.broadcasted_iota(jnp.float32, (S, S), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (S, S), 1)
    M = p_xyxy.shape[0]

    new_cls = []
    new_box = []
    new_ok = []
    for j in range(attempts):
        kj = jax.random.fold_in(key, j)
        k1, k2 = jax.random.split(kj)
        src_i = jax.random.randint(k1, (), 0, M)
        sb = p_xyxy[src_i]
        sw = jnp.clip(sb[2] - sb[0], 1.0, None)
        sh = jnp.clip(sb[3] - sb[1], 1.0, None)
        dst = jax.random.uniform(k2, (2,), minval=0.0, maxval=1.0) \
            * jnp.stack([S - sw, S - sh])
        dx, dy = dst[0], dst[1]
        dbox = jnp.stack([dx, dy, dx + sw, dy + sh])

        # IoA of the paste box with existing labels (reference :1174-1180)
        ix1 = jnp.maximum(xyxy[:, 0], dbox[0])
        iy1 = jnp.maximum(xyxy[:, 1], dbox[1])
        ix2 = jnp.minimum(xyxy[:, 2], dbox[2])
        iy2 = jnp.minimum(xyxy[:, 3], dbox[3])
        inter = jnp.clip(ix2 - ix1, 0, None) * jnp.clip(iy2 - iy1, 0, None)
        area = jnp.clip((xyxy[:, 2] - xyxy[:, 0])
                        * (xyxy[:, 3] - xyxy[:, 1]), 1e-9, None)
        ioa_ok = jnp.all(jnp.where(valid, inter / area, 0.0) < 0.30)
        ok = p_valid[src_i] & ioa_ok

        # shifted partner pixels: dest (y,x) reads partner at
        # (y - dy + sy1, x - dx + sx1)
        py = jnp.clip(ys - dy + sb[1], 0, S - 1).astype(jnp.int32)
        px = jnp.clip(xs - dx + sb[0], 0, S - 1).astype(jnp.int32)
        shifted = partner_img[py, px]
        in_box = (xs >= dbox[0]) & (xs < dbox[2]) \
            & (ys >= dbox[1]) & (ys < dbox[3])
        img = jnp.where((in_box & ok)[..., None], shifted, img)
        new_cls.append(p_cls[src_i])
        new_box.append(dbox)
        new_ok.append(ok)

    cls = jnp.concatenate([cls, jnp.stack(new_cls)])
    xyxy = jnp.concatenate([xyxy, jnp.stack(new_box)])
    valid = jnp.concatenate([valid, jnp.stack(new_ok)])
    return img, cls, xyxy, valid


def _pack_labels(cls, xyxy, valid, size: int, max_labels: int):
    """Sort valid labels first and truncate to max_labels; convert to
    normalized xywh."""
    order = jnp.argsort(~valid)                          # valid first, stable
    cls = cls[order][:max_labels]
    xyxy = xyxy[order][:max_labels]
    valid = valid[order][:max_labels]
    xc = (xyxy[:, 0] + xyxy[:, 2]) / 2 / size
    yc = (xyxy[:, 1] + xyxy[:, 3]) / 2 / size
    w = (xyxy[:, 2] - xyxy[:, 0]) / size
    h = (xyxy[:, 3] - xyxy[:, 1]) / size
    out = jnp.stack([cls, xc, yc, w, h], axis=-1)
    return jnp.where(valid[:, None], out, 0.0), valid


def augment_batch(images: jax.Array, hw: jax.Array, labels: jax.Array,
                  mask: jax.Array, key: jax.Array,
                  cfg: AugmentConfig) -> Batch:
    """Full train-time augmentation for a batch, entirely on device.

    images: (B,S,S,3) uint8/float 0-255 (content top-left, pad 114);
    hw: (B,2); labels: (B,M,5) [cls,xc,yc,w,h] normalized to content;
    mask: (B,M). Mosaic partners are drawn from within the batch.
    """
    B, S = images.shape[0], cfg.img_size
    images = images.astype(jnp.float32)
    keys = jax.random.split(key, 8)
    M_l = labels.shape[1]
    # mosaic partner indices (8 per image: mosaic-9 needs 8 partners,
    # mosaic-4 uses the first 3)
    partners = jax.random.randint(keys[0], (B, 8), 0, B)
    idx9 = jnp.concatenate([jnp.arange(B)[:, None], partners], axis=1)  # (B,9)

    def per_image(i, k):
        sel = idx9[i]

        def m4(_):
            img, cls, xyxy, valid = _one_mosaic(
                images[sel[:4]], hw[sel[:4]], labels[sel[:4]],
                mask[sel[:4]], k, cfg)
            pad = 5 * M_l                     # pad 4M -> 9M label slots
            return (img, jnp.pad(cls, (0, pad)),
                    jnp.pad(xyxy, ((0, pad), (0, 0))),
                    jnp.pad(valid, (0, pad)))

        def m9(_):
            return _one_mosaic9(images[sel], hw[sel], labels[sel],
                                mask[sel], k, cfg)

        if cfg.mosaic9 > 0:
            use9 = jax.random.uniform(jax.random.fold_in(k, 99)) < cfg.mosaic9
            return jax.lax.cond(use9, m9, m4, None)
        return m4(None)

    ks = jax.random.split(keys[1], B)
    img, cls, xyxy, valid = jax.vmap(per_image)(jnp.arange(B), ks)

    # copy-paste (reference pastein, utils/datasets.py:1161-1198)
    if cfg.paste_in > 0:
        pidx = partners[:, 0]
        p_h = hw[pidx, 0][:, None]
        p_w = hw[pidx, 1][:, None]
        p_cls = labels[pidx][..., 0]
        p_xyxy = jnp.stack([
            (labels[pidx][..., 1] - labels[pidx][..., 3] / 2) * p_w,
            (labels[pidx][..., 2] - labels[pidx][..., 4] / 2) * p_h,
            (labels[pidx][..., 1] + labels[pidx][..., 3] / 2) * p_w,
            (labels[pidx][..., 2] + labels[pidx][..., 4] / 2) * p_h,
        ], axis=-1)
        kp = jax.random.split(keys[6], B)
        active = jax.random.uniform(keys[7], (B,)) < cfg.paste_in

        def pi(img_i, c, b, v, p_img, pc, pb, pv, k, act):
            im2, c2, b2, v2 = paste_in(img_i, c, b, v, p_img, pc, pb,
                                       pv & act, k)
            return jnp.where(act, im2, img_i), c2, b2, v2

        img, cls, xyxy, valid = jax.vmap(pi)(
            img, cls, xyxy, valid, images[pidx], p_cls, p_xyxy,
            mask[pidx], kp, active)

    # cutout (reference utils/datasets.py:1133-1158; shipped disabled)
    if cfg.cutout > 0:
        kc = jax.random.split(jax.random.fold_in(keys[5], 3), B)
        act = jax.random.uniform(jax.random.fold_in(keys[5], 4),
                                 (B,)) < cfg.cutout

        def co(img_i, b, v, k, a):
            im2, v2 = cutout(img_i, b, v, k)
            return jnp.where(a, im2, img_i), jnp.where(a, v2, v)

        img, valid = jax.vmap(co)(img, xyxy, valid, kc, act)

    # mixup (reference :548-555): blend with a shifted copy of the batch
    do_mix = jax.random.uniform(keys[2], (B,)) < cfg.mixup
    ratio = jax.random.beta(keys[3], 8.0, 8.0, (B, 1, 1, 1))
    img2 = jnp.roll(img, 1, axis=0)
    img = jnp.where(do_mix[:, None, None, None],
                    img * ratio + img2 * (1 - ratio), img)
    cls2 = jnp.roll(cls, 1, axis=0)
    xyxy2 = jnp.roll(xyxy, 1, axis=0)
    valid2 = jnp.roll(valid, 1, axis=0) & do_mix[:, None]
    cls = jnp.concatenate([cls, cls2], axis=1)
    xyxy = jnp.concatenate([xyxy, xyxy2], axis=1)
    valid = jnp.concatenate([valid, valid2], axis=1)

    out_labels, out_mask = jax.vmap(
        lambda c, b, v: _pack_labels(c, b, v, S, cfg.max_labels))(
        cls, xyxy, valid)

    img = img / 255.0
    img = jax.vmap(lambda im, k: hsv_jitter(im, k, cfg))(
        img, jax.random.split(keys[4], B))

    # flips (reference :608-619); labels are normalized xywh already
    kud, klr = jax.random.split(keys[5])
    do_ud = jax.random.uniform(kud, (B,)) < cfg.flipud
    do_lr = jax.random.uniform(klr, (B,)) < cfg.fliplr
    img = jnp.where(do_ud[:, None, None, None], img[:, ::-1], img)
    img = jnp.where(do_lr[:, None, None, None], img[:, :, ::-1], img)
    ly = jnp.where(do_ud[:, None], 1.0 - out_labels[..., 2], out_labels[..., 2])
    lx = jnp.where(do_lr[:, None], 1.0 - out_labels[..., 1], out_labels[..., 1])
    out_labels = out_labels.at[..., 2].set(jnp.where(out_mask, ly, 0.0))
    out_labels = out_labels.at[..., 1].set(jnp.where(out_mask, lx, 0.0))

    return Batch(images=img, labels=out_labels, mask=out_mask)


def identity_batch(images: jax.Array, hw: jax.Array, labels: jax.Array):
    """No-augmentation normalization — what `augment_batch` does minus the
    randomness, so the train step sees ONE input contract either way
    (reference train.py:351 `imgs/255` + the letterboxed collate,
    utils/datasets.py:562-568).

    The loader's canvases are uint8 0-255 with the aspect-kept content at
    the top-left occupying (h, w) of the (H, W) canvas, and labels are
    xywh normalized to the *content*. Returns (images 0-1 float, labels
    normalized to the *canvas*).
    """
    img = images.astype(jnp.float32) / 255.0
    H, W = images.shape[1], images.shape[2]
    sy = (hw[:, 0] / H)[:, None]
    sx = (hw[:, 1] / W)[:, None]
    labels = jnp.stack([labels[..., 0],
                        labels[..., 1] * sx, labels[..., 2] * sy,
                        labels[..., 3] * sx, labels[..., 4] * sy], axis=-1)
    return img, labels


def letterbox_batch(images: jax.Array, hw: jax.Array,
                    size: "int | tuple[int, int]", scaleup: bool = False):
    """Eval-path letterbox: resize content to fit `size`, center, pad 114
    (reference letterbox utils/datasets.py:984-1014 with auto=False).
    `size` may be a single int (square) or a static (h, w) canvas — the
    rect-eval bucket shapes (reference rect=True batch_shapes,
    utils/datasets.py:424-446). Returns (imgs (B,sh,sw,3) float 0-1,
    ratio (B,), pad (B,2) as (pad_x, pad_y)).
    """
    size_h, size_w = (size, size) if isinstance(size, int) else size

    def per_image(img, wh_):
        h, w = wh_[0], wh_[1]
        r = jnp.minimum(size_h / h, size_w / w)
        if not scaleup:
            r = jnp.minimum(r, 1.0)
        nh = jnp.round(h * r)
        nw = jnp.round(w * r)
        oy = jnp.round((size_h - nh) / 2.0)
        ox = jnp.round((size_w - nw) / 2.0)
        # diagonal mapping out -> src: separable two-matmul resample
        # (the gather formulation costs ~100x more on TPU)
        idx_y = jnp.arange(size_h, dtype=jnp.float32)
        idx_x = jnp.arange(size_w, dtype=jnp.float32)
        ry, sy = _interp_matrix((idx_y - oy) / r, img.shape[0], bound=h)
        rx, sx = _interp_matrix((idx_x - ox) / r, img.shape[1], bound=w)
        tmp = jnp.einsum("yh,hwc->ywc", ry, img)
        out = jnp.einsum("ywc,xw->yxc", tmp, rx)
        cover = sy[:, None] * sx[None, :]
        out = out + PAD_VALUE * (1.0 - cover)[..., None]
        pad = jnp.stack([(size_w - nw) / 2.0, (size_h - nh) / 2.0])
        return out / 255.0, r, pad

    return jax.vmap(per_image)(images.astype(jnp.float32), hw)

"""Box geometry ops (pure jnp, fully jit/vmap-able, static shapes).

Re-implements the box math of the reference's ``utils/general.py``:
``xyxy2xywh``/``xywh2xyxy`` (reference utils/general.py:255,265),
``xywhn2xyxy`` (:275), ``scale_coords``/``clip_coords`` (:319,335),
``bbox_iou`` with GIoU/DIoU/CIoU/EIoU/SIoU variants (:427-525) and the
pairwise ``box_iou`` (:789). Formulas (including eps placement — eps is
added to h1/h2 and union, exactly as the reference does) match the
reference so loss values and mAP matching are numerically comparable.

All functions take arrays of shape (..., 4) and broadcast; no transposes
of the torch `box2.T` style are needed.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def xyxy2xywh(x: jax.Array) -> jax.Array:
    """(..., 4) [x1,y1,x2,y2] -> [xc,yc,w,h]."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(..., 4) [xc,yc,w,h] -> [x1,y1,x2,y2]."""
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([xc - w / 2, yc - h / 2, xc + w / 2, yc + h / 2], axis=-1)


def xywhn2xyxy(x: jax.Array, w: float = 640, h: float = 640,
               padw: float = 0, padh: float = 0) -> jax.Array:
    """Normalized [xc,yc,w,h] -> pixel [x1,y1,x2,y2] with optional pad offset."""
    xc, yc, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([
        w * (xc - bw / 2) + padw,
        h * (yc - bh / 2) + padh,
        w * (xc + bw / 2) + padw,
        h * (yc + bh / 2) + padh,
    ], axis=-1)


def xyxy2xywhn(x: jax.Array, w: float = 640, h: float = 640) -> jax.Array:
    """Pixel [x1,y1,x2,y2] -> normalized [xc,yc,w,h]."""
    y = xyxy2xywh(x)
    return y / jnp.asarray([w, h, w, h], dtype=y.dtype)


def clip_coords(boxes: jax.Array, img_shape: tuple[int, int]) -> jax.Array:
    """Clip xyxy boxes to image (height, width). Functional (returns new array)."""
    h, w = img_shape
    lo = jnp.zeros((4,), dtype=boxes.dtype)
    hi = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def scale_coords(img1_shape: tuple[int, int], coords: jax.Array,
                 img0_shape: tuple[int, int], ratio_pad=None) -> jax.Array:
    """Rescale xyxy coords from letterboxed `img1_shape` back to `img0_shape`.

    Mirrors reference utils/general.py:319-332 (gain = min ratio, centered
    padding), then clips to the original image.
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    offset = jnp.asarray([pad[0], pad[1], pad[0], pad[1]], dtype=coords.dtype)
    coords = (coords - offset) / gain
    return clip_coords(coords, img0_shape)


def box_iou(box1: jax.Array, box2: jax.Array, eps: float = 0.0) -> jax.Array:
    """Pairwise IoU of xyxy boxes: (N,4),(M,4) -> (N,M).

    Matches reference utils/general.py:789 (plain intersection-over-union,
    no eps in the reference; optional eps arg for safe division on padded
    zero-area boxes).
    """
    area1 = (box1[..., 2] - box1[..., 0]) * (box1[..., 3] - box1[..., 1])
    area2 = (box2[..., 2] - box2[..., 0]) * (box2[..., 3] - box2[..., 1])
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:], box2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area1[..., :, None] + area2[..., None, :] - inter + eps)


def bbox_iou(box1: jax.Array, box2: jax.Array, *, xywh: bool = True,
             GIoU: bool = False, DIoU: bool = False, CIoU: bool = False,
             EIoU: bool = False, SIoU: bool = False,
             eps: float = 1e-7) -> jax.Array:
    """Elementwise IoU family between broadcastable (..., 4) boxes.

    Reproduces reference utils/general.py:427-525 with alpha=1 (the value
    every reference call site uses): note the reference's eps placement —
    eps is added to h1, h2, union, and the CIoU `v/(v - iou + 1 + eps)`
    uses a stop-gradient, all preserved here.
    """
    if xywh:
        b1_x1, b1_x2 = box1[..., 0] - box1[..., 2] / 2, box1[..., 0] + box1[..., 2] / 2
        b1_y1, b1_y2 = box1[..., 1] - box1[..., 3] / 2, box1[..., 1] + box1[..., 3] / 2
        b2_x1, b2_x2 = box2[..., 0] - box2[..., 2] / 2, box2[..., 0] + box2[..., 2] / 2
        b2_y1, b2_y2 = box2[..., 1] - box2[..., 3] / 2, box2[..., 1] + box2[..., 3] / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0, None)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0, None))

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps

    iou = inter / (union + eps)
    if not (GIoU or DIoU or CIoU or EIoU or SIoU):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if CIoU or DIoU or EIoU or SIoU:
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if CIoU:
            v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha_ciou = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha_ciou + eps)
        if EIoU:
            rho_w2 = ((b2_x2 - b2_x1) - (b1_x2 - b1_x1)) ** 2
            rho_h2 = ((b2_y2 - b2_y1) - (b1_y2 - b1_y1)) ** 2
            return iou - (rho2 / c2 + rho_w2 / (cw ** 2 + eps) + rho_h2 / (ch ** 2 + eps))
        if SIoU:
            s_cw = (b2_x1 + b2_x2 - b1_x1 - b1_x2) * 0.5 + eps
            s_ch = (b2_y1 + b2_y2 - b1_y1 - b1_y2) * 0.5 + eps
            sigma = jnp.sqrt(s_cw ** 2 + s_ch ** 2)
            sin_a1 = jnp.abs(s_cw) / sigma
            sin_a2 = jnp.abs(s_ch) / sigma
            threshold = 2 ** 0.5 / 2
            sin_a = jnp.where(sin_a1 > threshold, sin_a2, sin_a1)
            angle_cost = jnp.cos(jnp.arcsin(sin_a) * 2 - math.pi / 2)
            gamma = angle_cost - 2
            rho_x = (s_cw / cw) ** 2
            rho_y = (s_ch / ch) ** 2
            distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
            omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
            omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
            shape_cost = (1 - jnp.exp(-omiga_w)) ** 4 + (1 - jnp.exp(-omiga_h)) ** 4
            return iou - (0.5 * (distance_cost + shape_cost) + eps)
        return iou - rho2 / c2  # DIoU
    c_area = cw * ch + eps
    return iou - ((c_area - union) / c_area + eps)  # GIoU


def wh_iou(wh1: jax.Array, wh2: jax.Array) -> jax.Array:
    """Pairwise IoU treating (w,h) boxes as corner-anchored: (N,2),(M,2)->(N,M)."""
    wh1 = wh1[:, None]
    wh2 = wh2[None]
    inter = jnp.prod(jnp.minimum(wh1, wh2), axis=2)
    return inter / (jnp.prod(wh1, axis=2) + jnp.prod(wh2, axis=2) - inter)


@partial(jax.jit, static_argnames=("img1_shape", "img0_shape"))
def scale_coords_jit(img1_shape, coords, img0_shape):
    return scale_coords(img1_shape, coords, img0_shape)

"""Batched, class-aware, fixed-shape NMS — fully on device.

TPU-native replacement for the reference's CPU/CUDA postprocess
(reference utils/general.py:953-1045 `non_max_suppression`, whose core op
is torchvision.ops.nms at :1029 — the one op where the reference leaves
the framework). Same semantics, static shapes:

- obj-confidence gate (:962,978); nc==1 shortcut score=obj (:994-996);
  conf = obj*cls otherwise (:998);
- multi-label or best-class candidate construction (:1004-1009);
- top-`max_nms` score prefilter (:1023-1024);
- class-offset trick `box + cls*4096` for class-aware NMS (:1027-1028);
- exact greedy suppression in score order (torchvision parity);
- fixed (max_det,) outputs with a validity mask instead of ragged lists.

Three interchangeable suppression backends (`method=`):

- "pallas": the TPU kernel in ops/pallas/nms_kernel.py — fixed-point
  `keep <- valid & (keep @ M == 0)` sweeps on the MXU with the K x K
  suppression matrix resident in VMEM (exactly greedy at convergence);
- "matrix": the same fixed-point algorithm in plain XLA (any backend,
  any K — the K x K IoU matrix lives in HBM);
- "greedy": a literal `lax.while_loop` over max_det selections (each
  step: pick first alive candidate, kill overlaps) — the slowest but
  most obviously-correct formulation, kept as the parity oracle.

"auto" picks pallas on TPU when K fits VMEM, else matrix.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rep_yolo_tpu.ops.boxes import xywh2xyxy

MAX_WH = 4096.0  # class-offset multiplier (reference utils/general.py:965)


class Detections(NamedTuple):
    boxes: jax.Array    # (B, max_det, 4) xyxy
    scores: jax.Array   # (B, max_det)
    classes: jax.Array  # (B, max_det) int32
    valid: jax.Array    # (B, max_det) bool
    count: jax.Array    # (B,) int32


def _pairwise_iou(box: jax.Array, boxes: jax.Array) -> jax.Array:
    """IoU of one (4,) box vs (K,4) boxes (torchvision convention)."""
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[:, 0] * wh[:, 1]
    return inter / (area1 + area2 - inter)


def _greedy_nms(boxes: jax.Array, scores: jax.Array, iou_thres: float,
                max_det: int) -> tuple[jax.Array, jax.Array]:
    """Exact greedy NMS over score-desc-sorted candidates.

    boxes: (K,4) offset boxes sorted by score desc; scores: (K,) with
    -inf for invalid slots. Returns (selected indices (max_det,),
    keep mask (max_det,)).
    """
    K = boxes.shape[0]
    alive = scores > -jnp.inf

    def body(state):
        t, alive, sel, keep = state
        # first alive candidate == highest-scoring alive (input is sorted)
        i = jnp.argmax(alive)
        any_alive = jnp.any(alive)
        sel = sel.at[t].set(jnp.where(any_alive, i, 0))
        keep = keep.at[t].set(any_alive)
        iou = _pairwise_iou(boxes[i], boxes)
        alive = alive & (iou <= iou_thres)
        alive = alive.at[i].set(False)
        return t + 1, alive, sel, keep

    def cond(state):
        t, alive, _, _ = state
        return (t < max_det) & jnp.any(alive)

    sel = jnp.zeros((max_det,), jnp.int32)
    keep = jnp.zeros((max_det,), bool)
    _, _, sel, keep = jax.lax.while_loop(
        cond, body, (jnp.int32(0), alive, sel, keep))
    return sel, keep


def _resolve_method(method: str, k: int) -> str:
    from rep_yolo_tpu.ops.pallas.nms_kernel import MAX_PALLAS_K

    if method != "auto":
        return method
    if jax.default_backend() == "tpu" and k <= MAX_PALLAS_K:
        return "pallas"
    return "matrix" if k <= MAX_PALLAS_K else "greedy"


@partial(jax.jit, static_argnames=(
    "conf_thres", "iou_thres", "max_det", "max_nms", "multi_label",
    "agnostic", "nc", "method", "merge", "presorted"))
def non_max_suppression(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    *,
    max_det: int = 300,
    max_nms: int = 4096,
    multi_label: bool = False,
    agnostic: bool = False,
    nc: int | None = None,
    method: str = "auto",
    merge: bool = False,
    presorted: bool = False,
) -> Detections:
    """prediction: (B, N, 5+nc) decoded [xc,yc,w,h,obj,cls...] in pixels.

    merge=True: merge-NMS — each kept box becomes the score-weighted mean
    of all candidates overlapping it above iou_thres (reference
    utils/general.py:1032-1037).

    presorted=True (serving fast path, nc==1 only): the caller guarantees
    rows are already score-descending over the whole candidate set with
    the conf gate applied upstream (models/heads.decode_topk with
    conf_thres=). Candidate construction is then a column split — the
    (B, N) masked full-set top_k (the costliest op of this function at
    N=25200) is skipped."""
    B, N, no = prediction.shape
    nc = no - 5 if nc is None else nc
    multi_label = multi_label and nc > 1
    if presorted and (nc != 1 or multi_label):
        raise ValueError("presorted NMS requires nc == 1")
    k = N if presorted else min(max_nms, N * nc if multi_label else N)
    method = _resolve_method(method, k)
    if merge and method == "greedy":
        method = "matrix"   # merge needs the candidate pool post-selection

    def candidates(x):
        """Per image: top-k score-desc candidate boxes/scores/classes."""
        box = xywh2xyxy(x[:, :4])               # (N,4)
        obj = x[:, 4]
        if nc == 1:
            scores = obj[:, None]               # (N,1): cls conf shortcut
        else:
            scores = x[:, 5:] * obj[:, None]    # (N,nc)

        if multi_label:
            flat = scores.reshape(-1)                        # (N*nc,)
            cand_mask = (flat > conf_thres) & jnp.repeat(obj > conf_thres, nc)
            cls_idx = jnp.tile(jnp.arange(nc), N)
            box_idx = jnp.repeat(jnp.arange(N), nc)
        else:
            best = jnp.max(scores, axis=1)
            cls_idx = jnp.argmax(scores, axis=1)
            flat = best
            cand_mask = (best > conf_thres) & (obj > conf_thres)
            box_idx = jnp.arange(N)

        masked = jnp.where(cand_mask, flat, -jnp.inf)
        top_scores, top_i = jax.lax.top_k(masked, k)         # sorted desc
        sel_box = box[box_idx[top_i]]                        # (k,4)
        sel_cls = cls_idx[top_i].astype(jnp.float32)
        offset = jnp.where(agnostic, 0.0, sel_cls * MAX_WH)
        nms_boxes = sel_box + offset[:, None]
        return nms_boxes, sel_box, top_scores, sel_cls

    if presorted:
        sel_box = xywh2xyxy(prediction[..., :4])             # (B,N,4)
        scores = prediction[..., 4]
        top_scores = jnp.where(scores > conf_thres, scores, -jnp.inf)
        sel_cls = jnp.zeros_like(scores)
        nms_boxes = sel_box                                  # cls 0: no offset
    else:
        nms_boxes, sel_box, top_scores, sel_cls = jax.vmap(candidates)(
            prediction)
    cand_valid = top_scores > -jnp.inf                       # (B,k)

    if method == "greedy":
        def one(nb, sb, ts, sc):
            sel, keep = _greedy_nms(nb, ts, iou_thres, max_det)
            out_boxes = jnp.where(keep[:, None], sb[sel], 0.0)
            out_scores = jnp.where(keep, ts[sel], 0.0)
            out_cls = jnp.where(keep, sc[sel].astype(jnp.int32), -1)
            return out_boxes, out_scores, out_cls, keep, \
                keep.sum().astype(jnp.int32)

        boxes, scores, classes, valid, count = jax.vmap(one)(
            nms_boxes, sel_box, top_scores, sel_cls)
        return Detections(boxes, scores, classes, valid, count)

    if method == "pallas":
        from rep_yolo_tpu.ops.pallas.nms_kernel import nms_keep_pallas

        keep = nms_keep_pallas(nms_boxes, cand_valid, float(iou_thres),
                               interpret=jax.default_backend() != "tpu")
    elif method == "matrix":
        from rep_yolo_tpu.ops.pallas.nms_kernel import nms_keep_matrix_xla

        keep = nms_keep_matrix_xla(nms_boxes, cand_valid, float(iou_thres))
    else:
        raise ValueError(f"unknown NMS method {method!r}")

    # fixed-shape selection: scores are already descending, so the first
    # max_det kept candidates ARE the greedy selections in order.
    cand_box = sel_box                                        # (B,k,4)
    masked = jnp.where(keep, top_scores, -jnp.inf)           # (B,k)
    if k < max_det:
        masked = jnp.pad(masked, ((0, 0), (0, max_det - k)),
                         constant_values=-jnp.inf)
        sel_box = jnp.pad(sel_box, ((0, 0), (0, max_det - k), (0, 0)))
        sel_cls = jnp.pad(sel_cls, ((0, 0), (0, max_det - k)))
    vals, idx = jax.lax.top_k(masked, max_det)               # (B,max_det)
    ok = vals > -jnp.inf
    out_boxes = jnp.take_along_axis(sel_box, idx[..., None], axis=1)
    if merge:
        # weighted-mean merge over overlapping candidates (class-aware via
        # the offset boxes, like the suppression itself)
        sel_nms = jnp.take_along_axis(nms_boxes, idx[..., None], axis=1)
        area_s = ((sel_nms[..., 2] - sel_nms[..., 0])
                  * (sel_nms[..., 3] - sel_nms[..., 1]))       # (B,D)
        area_c = ((nms_boxes[..., 2] - nms_boxes[..., 0])
                  * (nms_boxes[..., 3] - nms_boxes[..., 1]))   # (B,k)
        lt = jnp.maximum(sel_nms[:, :, None, :2], nms_boxes[:, None, :, :2])
        rb = jnp.minimum(sel_nms[:, :, None, 2:], nms_boxes[:, None, :, 2:])
        wh = jnp.maximum(rb - lt, 0.0)
        inter = wh[..., 0] * wh[..., 1]                        # (B,D,k)
        iou = inter / (area_s[:, :, None] + area_c[:, None, :] - inter)
        wgt = (iou > iou_thres) * jnp.where(cand_valid, top_scores,
                                            0.0)[:, None, :]   # (B,D,k)
        denom = jnp.maximum(wgt.sum(-1, keepdims=True), 1e-9)
        out_boxes = jnp.einsum("bdk,bkc->bdc", wgt, cand_box) / denom
    out_boxes = jnp.where(ok[..., None], out_boxes, 0.0)
    out_scores = jnp.where(ok, vals, 0.0)
    out_cls = jnp.where(
        ok, jnp.take_along_axis(sel_cls, idx, axis=1).astype(jnp.int32), -1)
    count = ok.sum(axis=1).astype(jnp.int32)
    return Detections(out_boxes, out_scores, out_cls, ok, count)


def detections_to_numpy(det: Detections) -> list:
    """Convert to the reference's per-image (n,6) [xyxy, conf, cls] arrays."""
    import numpy as np

    out = []
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    classes = np.asarray(det.classes)
    valid = np.asarray(det.valid)
    for b in range(boxes.shape[0]):
        m = valid[b]
        out.append(np.concatenate([
            boxes[b][m], scores[b][m, None], classes[b][m, None].astype(np.float32)
        ], axis=1))
    return out

"""Training objectives: classic YOLO loss and simOTA loss, fixed-shape.

Re-implements the reference's `ComputeLoss` (reference utils/loss.py:422-559)
and `ComputeLossOTA` (:562-852) as pure, jit-able functions over padded
target tensors:

- targets are (B, M, 5) [cls, x, y, w, h] (normalized xywh) with a (B, M)
  validity mask — the fixed-shape replacement for the reference's ragged
  (nt, 6) tensor;
- `find_3_positive`'s 3-neighbor candidate expansion (:801-852) becomes a
  dense (B, M, na, 5-offsets) candidate lattice with masks;
- simOTA's per-image dynamic-k top-k (:717-761) becomes a rank-based
  masked selection (exact same matches, ties broken by candidate order);
- scatter writes route invalid candidates to dropped out-of-bounds indices.

Reference quirk reproduced on purpose: classic ComputeLoss adds the
(1 - iou).mean() box term TWICE (reference utils/loss.py:473,475), so the
effective box gain is 2x. We reproduce it for training parity.

Head maps are NHWC-ordered: (B, H, W, na, no); candidate gathers index
[b, gj, gi, a].
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from rep_yolo_tpu.ops.boxes import bbox_iou, box_iou, xywh2xyxy


@dataclasses.dataclass(frozen=True)
class LossConfig:
    nc: int = 1
    box_gain: float = 0.05
    obj_gain: float = 0.7
    cls_gain: float = 0.3
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    gr: float = 1.0                 # obj-iou ratio (train.py sets model.gr=1.0)
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    balance: tuple = (4.0, 1.0, 0.4)   # P3-P5 (reference utils/loss.py:442)
    aux_weight: float = 0.25           # lead/aux weighting (utils/loss.py:1265-1279)

    @property
    def cp(self) -> float:
        return 1.0 - 0.5 * self.label_smoothing

    @property
    def cn(self) -> float:
        return 0.5 * self.label_smoothing


def _topk_iter(x: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis by k argmax+mask passes.

    Drop-in for jax.lax.top_k when k is small and the row is wide: XLA
    lowers top_k on TPU to a full variadic (value, index) sort of the
    row — the b8 train trace billed the two simOTA k=10 top_ks over
    (8, 120, 5400) at 4.76 ms EACH. k reduce+select passes are ~10x
    cheaper at k=10. Tie-break matches lax.top_k (lowest index first:
    argmax returns the first maximum)."""
    vals, idxs = [], []
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    for _ in range(k):
        i = jnp.argmax(x, axis=-1)                      # (...,)
        v = jnp.max(x, axis=-1)
        vals.append(v)
        idxs.append(i)
        x = jnp.where(iota == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def balance_for(nl: int) -> tuple:
    """Per-level obj-loss balance (reference utils/loss.py:442):
    3-level P3-P5 -> [4.0, 1.0, 0.4]; 4/5-level P3-P6/P7 ->
    [4.0, 1.0, 0.25, 0.06, 0.02][:nl]."""
    if nl == 3:
        return (4.0, 1.0, 0.4)
    return tuple([4.0, 1.0, 0.25, 0.06, 0.02][:nl])


def bce_with_logits(x, z, pos_weight: float = 1.0):
    """Elementwise BCEWithLogits with pos_weight (torch semantics)."""
    return pos_weight * z * jax.nn.softplus(-x) + (1.0 - z) * jax.nn.softplus(x)


def focal_bce(x, z, gamma: float, pos_weight: float = 1.0, alpha: float = 0.25):
    """FocalLoss wrapper (reference utils/loss.py:121-148), mean-free."""
    loss = bce_with_logits(x, z, pos_weight)
    pred_prob = jax.nn.sigmoid(x)
    p_t = z * pred_prob + (1 - z) * (1 - pred_prob)
    alpha_factor = z * alpha + (1 - z) * (1 - alpha)
    return loss * alpha_factor * (1.0 - p_t) ** gamma


def _obj_bce(x, z, cfg: LossConfig):
    if cfg.fl_gamma > 0:
        return focal_bce(x, z, cfg.fl_gamma, cfg.obj_pw)
    return bce_with_logits(x, z, cfg.obj_pw)


def _cls_bce(x, z, cfg: LossConfig):
    if cfg.fl_gamma > 0:
        return focal_bce(x, z, cfg.fl_gamma, cfg.cls_pw)
    return bce_with_logits(x, z, cfg.cls_pw)


def masked_mean(x, mask, eps: float = 1e-9):
    m = mask.astype(x.dtype)
    return (x * m).sum() / jnp.maximum(m.sum(), 1.0)


class Candidates(NamedTuple):
    """Dense per-level candidate lattice, all shapes (B, M, na, 5)."""
    gi: jax.Array       # grid x index (int32, clamped)
    gj: jax.Array       # grid y index
    valid: jax.Array    # bool
    txy: jax.Array      # target xy in grid units (..., 2) — pre-offset
    twh: jax.Array      # target wh in grid units (..., 2)
    anchor: jax.Array   # (na, 2) stride-normalized anchors for this level


# 5-offset stencil (reference utils/loss.py:515-518): center, +x, +y, -x, -y.
_OFF = jnp.asarray([[0., 0.], [0.5, 0.], [0., 0.5], [-0.5, 0.], [0., -0.5]])


def find_3_positive(targets: jax.Array, tmask: jax.Array,
                    shape_hw: tuple[int, int], anchors: jax.Array,
                    anchor_t: float, g: float = 0.5) -> Candidates:
    """Vectorized reference find_3_positive (utils/loss.py:801-852) for one
    level. targets: (B, M, 5) [cls,x,y,w,h] normalized; anchors (na,2) in
    grid units. With g=1.0 this is find_5_positive (utils/loss.py:1599-1650,
    used for aux heads).
    """
    H, W = shape_hw
    na = anchors.shape[0]
    gain = jnp.asarray([W, H, W, H], jnp.float32)
    txywh = targets[..., 1:5] * gain                  # (B,M,4) grid units
    gxy, gwh = txywh[..., :2], txywh[..., 2:]

    # anchor ratio filter: (B, M, na)
    r = gwh[:, :, None, :] / anchors[None, None]      # (B,M,na,2)
    ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t
    base_valid = tmask[:, :, None] & ratio_ok         # (B,M,na)

    # neighbor-cell conditions (reference :829-835)
    gxi = gain[:2] - gxy                              # inverse coords
    jj = (gxy[..., 0] % 1.0 < g) & (gxy[..., 0] > 1.0)
    kk = (gxy[..., 1] % 1.0 < g) & (gxy[..., 1] > 1.0)
    ll = (gxi[..., 0] % 1.0 < g) & (gxi[..., 0] > 1.0)
    mm = (gxi[..., 1] % 1.0 < g) & (gxi[..., 1] > 1.0)
    ones = jnp.ones_like(jj)
    off_ok = jnp.stack([ones, jj, kk, ll, mm], axis=-1)      # (B,M,5)

    valid = base_valid[..., None] & off_ok[:, :, None, :]    # (B,M,na,5)
    B, Mt = tmask.shape
    gij = jnp.floor(gxy[:, :, None, None, :]
                    - (2.0 * g) * _OFF[None, None, None])
    gij = jnp.broadcast_to(gij, (B, Mt, na, 5, 2))
    gi = jnp.clip(gij[..., 0].astype(jnp.int32), 0, W - 1)
    gj = jnp.clip(gij[..., 1].astype(jnp.int32), 0, H - 1)

    txy = jnp.broadcast_to(gxy[:, :, None, None, :], gij.shape)
    twh = jnp.broadcast_to(gwh[:, :, None, None, :], gij.shape)
    return Candidates(gi=gi, gj=gj, valid=valid, txy=txy, twh=twh,
                      anchor=anchors)


def _gather_preds(pi: jax.Array, gi, gj):
    """pi: (B,H,W,na,no); gi/gj: (B,M,na,5) -> (B,M,na,5,no) with the
    anchor axis aligned."""
    B, H, W, na, no = pi.shape
    b = jnp.arange(B)[:, None, None, None]
    a = jnp.arange(na)[None, None, :, None]
    return pi[b, gj, gi, a]


def _scatter_obj(tobj: jax.Array, gi, gj, valid, values):
    """tobj: (B,H,W,na); indices (B,M,na,5). Invalid -> dropped (OOB)."""
    B, H, W, na = tobj.shape
    b = jnp.broadcast_to(jnp.arange(B)[:, None, None, None], gi.shape)
    a = jnp.broadcast_to(jnp.arange(na)[None, None, :, None], gi.shape)
    gj_ = jnp.where(valid, gj, H)  # OOB row -> dropped by scatter
    return tobj.at[b.reshape(-1), gj_.reshape(-1), gi.reshape(-1),
                   a.reshape(-1)].set(values.reshape(-1), mode="drop")


def compute_loss(preds: Sequence[jax.Array], targets: jax.Array,
                 tmask: jax.Array, anchors_grid, cfg: LossConfig):
    """Classic YOLO loss (reference utils/loss.py:450-504).

    preds: list of (B,H,W,na,no) raw maps; targets (B,M,5); tmask (B,M).
    Returns (total_loss * B, components dict).
    """
    B = preds[0].shape[0]
    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    anchors_grid = jnp.asarray(anchors_grid)

    for i, pi in enumerate(preds):
        H, W = pi.shape[1], pi.shape[2]
        cand = find_3_positive(targets, tmask, (H, W), anchors_grid[i],
                               cfg.anchor_t)
        ps = _gather_preds(pi, cand.gi, cand.gj)      # (B,M,na,5,no)

        # regression (reference :465-475)
        gij = jnp.stack([cand.gi, cand.gj], axis=-1).astype(jnp.float32)
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = ((jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2
               * cand.anchor[None, None, :, None, :])
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        tbox = jnp.concatenate([cand.txy - gij, cand.twh], axis=-1)
        iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True)
        # reference quirk: the (1-iou) term is added twice (:473 + :475)
        lbox = lbox + 2.0 * masked_mean(1.0 - iou, cand.valid)

        # objectness (reference :478)
        tobj = jnp.zeros(pi.shape[:4], pi.dtype)
        obj_val = (1.0 - cfg.gr) + cfg.gr * jnp.clip(
            jax.lax.stop_gradient(iou), 0.0, None)
        tobj = _scatter_obj(tobj, cand.gi, cand.gj, cand.valid, obj_val)
        lobj = lobj + _obj_bce(pi[..., 4], tobj, cfg).mean() * cfg.balance[i]

        # classification (reference :481-485)
        if cfg.nc > 1:
            t = jnp.full(ps[..., 5:].shape, cfg.cn, pi.dtype)
            cls_ids = targets[..., 0].astype(jnp.int32)       # (B,M)
            onehot = jax.nn.one_hot(cls_ids, cfg.nc, dtype=pi.dtype)
            t = t + (cfg.cp - cfg.cn) * onehot[:, :, None, None, :]
            ce = _cls_bce(ps[..., 5:], t, cfg).mean(-1)
            lcls = lcls + masked_mean(ce, cand.valid) * cfg.nc

    lbox = lbox * cfg.box_gain
    lobj = lobj * cfg.obj_gain
    lcls = lcls * cfg.cls_gain
    total = lbox + lobj + lcls
    comps = {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
    return total * B, comps


# ---------------------------------------------------------------------------
# simOTA
# ---------------------------------------------------------------------------

def _standard_wh_obj_cls(ps, cand, stride, cfg):
    """Default candidate decode: wh = (2*sigmoid)^2 * anchor; layout
    [x,y,w,h,obj,cls...]."""
    pwh = ((jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2
           * cand.anchor[None, None, :, None, :] * stride)
    return pwh, ps[..., 4:5], ps[..., 5:]


def _ota_match(targets, tmask, cands: Sequence[Candidates],
               preds: Sequence[jax.Array], strides, img_size: int,
               cfg: LossConfig, top_candidates: int = 10,
               wh_obj_cls=_standard_wh_obj_cls):
    """Vectorized simOTA matching (reference utils/loss.py:644-799).

    Returns per-level (fg mask (B,C_l), matched target idx (B,C_l)) where
    C_l = M*na*5 flattened candidates of that level. `wh_obj_cls`
    customises the candidate decode (IBin's binned wh, reference
    utils/loss.py:940-1000).
    """
    B, M = tmask.shape
    nl = len(preds)

    # Flatten per-level candidates and decode their predictions to pixels.
    per_level = []
    for i, (pi, cand) in enumerate(zip(preds, cands)):
        ps = _gather_preds(pi, cand.gi, cand.gj)      # (B,M,na,5,no)
        C = M * cand.gi.shape[2] * 5
        gij = jnp.stack([cand.gi, cand.gj], -1).astype(jnp.float32)
        pxy = (jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5 + gij) * strides[i]
        pwh, p_obj, p_cls = wh_obj_cls(ps, cand, strides[i], cfg)
        pxyxy = xywh2xyxy(jnp.concatenate([pxy, pwh], -1)).reshape(B, C, 4)
        p_obj = p_obj.reshape(B, C, 1)
        p_cls = p_cls.reshape(B, C, cfg.nc)
        valid = cand.valid.reshape(B, C)
        # the target index each candidate was spawned from
        tidx = jnp.broadcast_to(
            jnp.arange(M)[None, :, None, None],
            cand.valid.shape).reshape(B, C)
        per_level.append((pxyxy, p_obj, p_cls, valid, tidx))

    pxyxy = jnp.concatenate([p[0] for p in per_level], axis=1)  # (B,C,4)
    p_obj = jnp.concatenate([p[1] for p in per_level], axis=1)
    p_cls = jnp.concatenate([p[2] for p in per_level], axis=1)
    valid = jnp.concatenate([p[3] for p in per_level], axis=1)  # (B,C)
    C = pxyxy.shape[1]

    txyxy = xywh2xyxy(targets[..., 1:5] * img_size)             # (B,M,4)

    # pairwise IoU (B,M,C), masked
    pair_iou = jax.vmap(box_iou)(txyxy, pxyxy)
    pair_mask = tmask[:, :, None] & valid[:, None, :]
    pair_iou = jnp.where(pair_mask, pair_iou, 0.0)
    iou_loss = -jnp.log(pair_iou + 1e-8)

    # dynamic-k per gt (reference :721-722)
    k_top = min(top_candidates, C)
    topk_iou, _ = _topk_iter(pair_iou, k_top)
    dynamic_ks = jnp.clip(topk_iou.sum(-1).astype(jnp.int32), 1, None)  # (B,M)

    # pairwise cls cost (reference :724-746)
    gt_onehot = jax.nn.one_hot(targets[..., 0].astype(jnp.int32), cfg.nc)
    y = jnp.sqrt(jax.nn.sigmoid(p_cls) * jax.nn.sigmoid(p_obj))
    y = jnp.clip(y, 1e-7, 1.0 - 1e-7)
    logit_y = jnp.log(y / (1.0 - y))                            # (B,C,nc)
    ce = bce_with_logits(logit_y[:, None], gt_onehot[:, :, None]) # (B,M,C,nc)
    pair_cls_loss = ce.sum(-1)

    cost = pair_cls_loss + 3.0 * iou_loss
    INF = 1e9
    cost = jnp.where(pair_mask, cost, INF)

    # dynamic-k selection: candidate j matched to gt i iff its cost is
    # among the k_i smallest of row i (reference topk(largest=False)
    # semantics, utils/loss.py:749-751). k_i <= k_top (it is a clipped
    # sum of k_top IoUs), so one k_top-wide top_k of the negated costs
    # replaces the double argsort over the full (B, M, C) cost — the b8
    # train trace showed those sorts at ~10 ms/step. The selected
    # *indices* are scattered (broadcast-compare) rather than a cost
    # threshold applied: equal costs are common in f32 (adjacent cells
    # of the same anchor), and top_k's lowest-index tie-break preserves
    # the exact rank semantics where a threshold would over-match.
    _, sel_idx = _topk_iter(-cost, k_top)                       # (B,M,k)
    sel_on = jnp.arange(k_top)[None, None, :] < dynamic_ks[..., None]
    matching = jnp.any(
        (sel_idx[..., None] == jnp.arange(C)[None, None, None, :])
        & sel_on[..., None], axis=-2)                           # (B,M,C)
    matching = matching & pair_mask

    # conflict resolution (reference :757-761): candidates matched to >1 gt
    # keep only their argmin-cost gt.
    col_counts = matching.sum(axis=1)                           # (B,C)
    cost_for_min = jnp.where(matching, cost, INF)
    argmin_gt = jnp.argmin(cost_for_min, axis=1)                # (B,C)
    keep_row = jax.nn.one_hot(argmin_gt, M, dtype=bool).transpose(0, 2, 1)
    matching = jnp.where((col_counts > 1)[:, None, :],
                         matching & keep_row, matching)

    fg = matching.any(axis=1)                                   # (B,C)
    matched_gt = jnp.argmax(matching, axis=1)                   # (B,C)

    # split back per level
    out = []
    start = 0
    for i, (pxyxy_l, *_rest) in enumerate(per_level):
        C_l = pxyxy_l.shape[1]
        out.append((fg[:, start:start + C_l],
                    matched_gt[:, start:start + C_l]))
        start += C_l
    return out


def _level_loss(pi, cand: Candidates, fg, mgt, targets, cfg: LossConfig,
                balance: float, weight: float = 1.0):
    """Shared per-level OTA loss body (box + obj + cls), `weight` scales
    box/cls contributions and the obj term (the 0.25 aux factor)."""
    B = pi.shape[0]
    H, W = pi.shape[1], pi.shape[2]
    na = cand.gi.shape[2]
    C = fg.shape[1]
    gi = cand.gi.reshape(B, C)
    gj = cand.gj.reshape(B, C)
    a = jnp.broadcast_to(
        jnp.arange(na)[None, :, None], cand.valid.shape[1:]).reshape(1, C)
    a = jnp.broadcast_to(a, (B, C))
    anchor = cand.anchor[a.reshape(-1)].reshape(B, C, 2)

    b_idx = jnp.arange(B)[:, None]
    ps = pi[b_idx, gj, gi, a]

    gain = jnp.asarray([W, H, W, H], jnp.float32)
    t_sel = jnp.take_along_axis(targets, mgt[..., None], axis=1)
    tbox = t_sel[..., 1:5] * gain
    grid = jnp.stack([gi, gj], -1).astype(jnp.float32)
    tbox = tbox.at[..., :2].add(-grid)

    pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
    pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * anchor
    pbox = jnp.concatenate([pxy, pwh], -1)
    iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True)
    lbox = weight * masked_mean(1.0 - iou, fg)

    tobj = jnp.zeros(pi.shape[:4], pi.dtype)
    obj_val = (1.0 - cfg.gr) + cfg.gr * jnp.clip(
        jax.lax.stop_gradient(iou), 0.0, None)
    gj_ = jnp.where(fg, gj, H)
    tobj = tobj.at[jnp.broadcast_to(b_idx, (B, C)).reshape(-1),
                   gj_.reshape(-1), gi.reshape(-1),
                   a.reshape(-1)].set(obj_val.reshape(-1), mode="drop")
    lobj = weight * _obj_bce(pi[..., 4], tobj, cfg).mean() * balance

    lcls = 0.0
    if cfg.nc > 1:
        cls_ids = t_sel[..., 0].astype(jnp.int32)
        t = jnp.full((B, C, cfg.nc), cfg.cn, pi.dtype)
        t = t + (cfg.cp - cfg.cn) * jax.nn.one_hot(cls_ids, cfg.nc,
                                                   dtype=pi.dtype)
        ce = _cls_bce(ps[..., 5:], t, cfg).mean(-1)
        lcls = weight * masked_mean(ce, fg) * cfg.nc
    return lbox, lobj, lcls


def compute_loss_aux_ota(preds: Sequence[jax.Array], targets: jax.Array,
                         tmask: jax.Array, anchors_grid, strides,
                         img_size: int, cfg: LossConfig):
    """Aux-head simOTA loss (reference utils/loss.py:1182-1291): lead heads
    matched via find_3_positive + top-20 OTA, aux heads via find_5_positive
    (g=1.0) + top-20 OTA against the *lead* predictions; aux contributions
    weighted 0.25 (reference :1265-1279).

    preds: 2*nl maps [lead..., aux...], each (B,H,W,na,no).
    """
    nl = len(preds) // 2
    lead = list(preds[:nl])
    aux = list(preds[nl:])
    anchors_grid = jnp.asarray(anchors_grid)

    cands = [find_3_positive(targets, tmask, (p.shape[1], p.shape[2]),
                             anchors_grid[i], cfg.anchor_t, g=0.5)
             for i, p in enumerate(lead)]
    cands_aux = [find_3_positive(targets, tmask, (p.shape[1], p.shape[2]),
                                 anchors_grid[i], cfg.anchor_t, g=1.0)
                 for i, p in enumerate(lead)]
    matches = _ota_match(targets, tmask, cands, lead, strides, img_size,
                         cfg, top_candidates=20)
    matches_aux = _ota_match(targets, tmask, cands_aux, lead, strides,
                             img_size, cfg, top_candidates=20)

    B = lead[0].shape[0]
    lbox = lobj = lcls = 0.0
    for i in range(nl):
        lb, lo, lc = _level_loss(lead[i], cands[i], *matches[i], targets,
                                 cfg, cfg.balance[i], 1.0)
        lbox, lobj, lcls = lbox + lb, lobj + lo, lcls + lc
        lb, lo, lc = _level_loss(aux[i], cands_aux[i], *matches_aux[i],
                                 targets, cfg, cfg.balance[i],
                                 cfg.aux_weight)
        lbox, lobj, lcls = lbox + lb, lobj + lo, lcls + lc

    lbox = lbox * cfg.box_gain
    lobj = lobj * cfg.obj_gain
    lcls = lcls * cfg.cls_gain
    total = lbox + lobj + lcls
    comps = {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
    return total * B, comps


def compute_loss_bin_ota(preds: Sequence[jax.Array], targets: jax.Array,
                         tmask: jax.Array, anchors_grid, strides,
                         img_size: int, cfg: LossConfig,
                         bin_count: int = 21):
    """simOTA loss for the IBin head (reference utils/loss.py:855-1181):
    raw layout per anchor [x, y, w_bin(L), h_bin(L), obj, cls...] with
    L = bin_count+1. Box loss = SigmoidBin BCE+MSE on the w/h ratio
    (target wh / anchor wh, clamped to the bin range [0,4]) PLUS CIoU on
    the decoded box; obj/cls identical to OTA.
    """
    from rep_yolo_tpu.ops.sigmoid_bin import SigmoidBinSpec

    spec = SigmoidBinSpec(bin_count=bin_count, vmin=0.0, vmax=4.0)
    L = spec.length
    B, M = tmask.shape
    anchors_grid = jnp.asarray(anchors_grid)

    def bin_wh_obj_cls(ps, cand, stride, cfg):
        anc = cand.anchor[None, None, :, None, :]
        pw = spec.forward(jax.nn.sigmoid(ps[..., 2:2 + L])) * anc[..., 0]
        ph = spec.forward(jax.nn.sigmoid(ps[..., 2 + L:2 + 2 * L])) \
            * anc[..., 1]
        pwh = jnp.stack([pw, ph], -1) * stride
        return pwh, ps[..., 2 + 2 * L:3 + 2 * L], ps[..., 3 + 2 * L:]

    cands = [find_3_positive(targets, tmask, (p.shape[1], p.shape[2]),
                             anchors_grid[i], cfg.anchor_t)
             for i, p in enumerate(preds)]
    matches = _ota_match(targets, tmask, cands, preds, strides, img_size,
                         cfg, wh_obj_cls=bin_wh_obj_cls)

    lbox = lobj = lcls = 0.0
    for i, (pi, cand) in enumerate(zip(preds, cands)):
        fg, mgt = matches[i]
        H, W = pi.shape[1], pi.shape[2]
        na = cand.gi.shape[2]
        C = fg.shape[1]
        gi = cand.gi.reshape(B, C)
        gj = cand.gj.reshape(B, C)
        a = jnp.broadcast_to(
            jnp.arange(na)[None, :, None], cand.valid.shape[1:]).reshape(1, C)
        a = jnp.broadcast_to(a, (B, C))
        anchor = cand.anchor[a.reshape(-1)].reshape(B, C, 2)
        b_idx = jnp.arange(B)[:, None]
        ps = pi[b_idx, gj, gi, a]

        gain = jnp.asarray([W, H, W, H], jnp.float32)
        t_sel = jnp.take_along_axis(targets, mgt[..., None], axis=1)
        tbox = t_sel[..., 1:5] * gain
        grid = jnp.stack([gi, gj], -1).astype(jnp.float32)
        tbox = tbox.at[..., :2].add(-grid)

        # binned wh regression on the wh/anchor ratio
        # (reference utils/loss.py:1063-1073)
        tw = jnp.clip(tbox[..., 2] / anchor[..., 0], spec.vmin, spec.vmax)
        th = jnp.clip(tbox[..., 3] / anchor[..., 1], spec.vmin, spec.vmax)
        w_loss, pw_ratio = spec.training_loss(ps[..., 2:2 + L], tw, fg)
        h_loss, ph_ratio = spec.training_loss(ps[..., 2 + L:2 + 2 * L], th, fg)
        lbox = lbox + w_loss + h_loss

        pxy = jax.nn.sigmoid(ps[..., :2]) * 2.0 - 0.5
        pwh = jnp.stack([pw_ratio * anchor[..., 0],
                         ph_ratio * anchor[..., 1]], -1)
        pbox = jnp.concatenate([pxy, pwh], -1)
        iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True)
        lbox = lbox + masked_mean(1.0 - iou, fg)

        tobj = jnp.zeros(pi.shape[:4], pi.dtype)
        obj_val = (1.0 - cfg.gr) + cfg.gr * jnp.clip(
            jax.lax.stop_gradient(iou), 0.0, None)
        gj_ = jnp.where(fg, gj, H)
        tobj = tobj.at[jnp.broadcast_to(b_idx, (B, C)).reshape(-1),
                       gj_.reshape(-1), gi.reshape(-1),
                       a.reshape(-1)].set(obj_val.reshape(-1), mode="drop")
        lobj = lobj + _obj_bce(pi[..., 2 + 2 * L], tobj, cfg).mean() \
            * cfg.balance[i]

        if cfg.nc > 1:
            cls_ids = t_sel[..., 0].astype(jnp.int32)
            t = jnp.full((B, C, cfg.nc), cfg.cn, pi.dtype)
            t = t + (cfg.cp - cfg.cn) * jax.nn.one_hot(cls_ids, cfg.nc,
                                                       dtype=pi.dtype)
            ce = _cls_bce(ps[..., 3 + 2 * L:], t, cfg).mean(-1)
            lcls = lcls + masked_mean(ce, fg) * cfg.nc

    lbox = lbox * cfg.box_gain
    lobj = lobj * cfg.obj_gain
    lcls = lcls * cfg.cls_gain
    total = lbox + lobj + lcls
    comps = {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
    return total * B, comps


def compute_loss_ota(preds: Sequence[jax.Array], targets: jax.Array,
                     tmask: jax.Array, anchors_grid, strides,
                     img_size: int, cfg: LossConfig):
    """simOTA loss (reference utils/loss.py:588-642).

    preds: list of (B,H,W,na,no); targets (B,M,5) normalized; img_size in px.
    """
    B, M = tmask.shape
    anchors_grid = jnp.asarray(anchors_grid)
    cands = [find_3_positive(targets, tmask, (p.shape[1], p.shape[2]),
                             anchors_grid[i], cfg.anchor_t)
             for i, p in enumerate(preds)]
    matches = _ota_match(targets, tmask, cands, preds, strides, img_size, cfg)

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    for i, (pi, cand) in enumerate(zip(preds, cands)):
        lb, lo, lc = _level_loss(pi, cand, *matches[i], targets, cfg,
                                 cfg.balance[i], 1.0)
        lbox, lobj, lcls = lbox + lb, lobj + lo, lcls + lc

    lbox = lbox * cfg.box_gain
    lobj = lobj * cfg.obj_gain
    lcls = lcls * cfg.cls_gain
    total = lbox + lobj + lcls
    comps = {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
    return total * B, comps

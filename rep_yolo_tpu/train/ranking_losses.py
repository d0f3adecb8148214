"""Ranking-based classification losses: RankSort, aLRP, AP.

JAX ports of the reference's autograd Functions
(reference utils/loss.py:176-421 — present in the zoo, unused by the
drivers). The reference computes hand-derived "identity update" gradients
inside a Python loop over positives; every quantity in those loops is a
pairwise relation of static logits, so here they are vectorized into
(N, N) relation matrices (VPU/MXU work, one shot, no sequential loop) —
APLoss's running interpolated-precision max becomes a cummax over the
score-sorted order. Fixed shapes: callers pass full logit/target vectors;
fg/bg membership is by mask, padded entries use target = -1.

Gradients are attached with jax.custom_vjp exactly as the reference's
backward does: d(loss)/d(logits) = stored_grads * upstream.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _masked_min(x, mask, big=1e30):
    return jnp.min(jnp.where(mask, x, big))


def _rel(diff, delta):
    """Piecewise-linear step surrogate (reference utils/loss.py:207-212)."""
    if delta > 0:
        return jnp.clip(diff / (2 * delta) + 0.5, 0.0, 1.0)
    return (diff >= 0).astype(jnp.float32)


def _rank_sort_fwd_impl(logits, targets, delta_rs, eps):
    fg = targets > 0.0
    fg_f = fg.astype(jnp.float32)
    fg_num = jnp.maximum(fg_f.sum(), 1.0)
    thr = _masked_min(logits, fg) - delta_rs
    bg = (targets == 0.0) & (logits >= thr)
    bg_f = bg.astype(jnp.float32)

    # R[i, j] = relation of example j w.r.t. anchor positive i
    diff = logits[None, :] - logits[:, None]          # (N, N): l_j - l_i
    R = _rel(diff, delta_rs)
    R_fg = R * fg_f[None, :]                          # only fg columns
    R_bg = R * bg_f[None, :]                          # only bg columns

    rank_pos = (R_fg).sum(-1)                         # includes self (rel=0.5->1? self diff=0 -> 0.5/.. = 0.5 .. careful)
    # NB: for j == i, diff = 0 -> rel = 0.5 with delta>0? No: 0/(2d)+0.5 = 0.5.
    # The reference keeps the self-term: fg_relations includes ii with value
    # 0.5 clamped -> 0.5. Wait - reference clamps 0/(2*0.5)+0.5 = 0.5. BUT the
    # reference uses delta_RS=0.5 so self-relation = 0.5. It does NOT zero it
    # (unlike aLRP/AP). Parity kept: self stays.
    FP_num = (R_bg).sum(-1)
    rank = rank_pos + FP_num
    ranking_error = jnp.where(fg, FP_num / jnp.maximum(rank, 1e-12), 0.0)

    one_minus_t = (1.0 - targets) * fg_f
    cur_sort_err = (R_fg * one_minus_t[None, :]).sum(-1) \
        / jnp.maximum(rank_pos, 1e-12)
    iou_rel = (targets[None, :] >= targets[:, None]).astype(jnp.float32)
    tso = iou_rel * R_fg
    rank_pos_t = tso.sum(-1)
    tgt_sort_err = (tso * one_minus_t[None, :]).sum(-1) \
        / jnp.maximum(rank_pos_t, 1e-12)
    sorting_error = jnp.where(fg, cur_sort_err - tgt_sort_err, 0.0)

    # gradients (identity update), all rows i are fg anchors
    has_fp = FP_num > eps
    fg_grad = jnp.where(fg & has_fp, -ranking_error, 0.0)
    bg_grad = (R_bg * jnp.where(
        has_fp, ranking_error / jnp.maximum(FP_num, 1e-12), 0.0
    )[:, None] * fg_f[:, None]).sum(0)

    missorted = (1.0 - iou_rel) * R_fg
    pmf_denom = missorted.sum(-1)
    has_ms = pmf_denom > eps
    fg_grad = fg_grad - jnp.where(fg & has_ms, sorting_error, 0.0)
    fg_grad = fg_grad + (missorted * jnp.where(
        has_ms, sorting_error / jnp.maximum(pmf_denom, 1e-12), 0.0
    )[:, None] * fg_f[:, None]).sum(0)

    grads = jnp.where(fg, fg_grad, jnp.where(bg, bg_grad, 0.0)) / fg_num
    rank_err_mean = (ranking_error * fg_f).sum() / fg_num
    sort_err_mean = (sorting_error * fg_f).sum() / fg_num
    return rank_err_mean, sort_err_mean, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def rank_sort_loss(logits, targets, delta_rs: float = 0.5, eps: float = 1e-10):
    """(ranking_error, sorting_error) with reference-identical gradients
    w.r.t. logits (reference RankSort, utils/loss.py:176-272).
    targets: IoU-valued in (0, 1] for positives, 0 for negatives."""
    r, s, _ = _rank_sort_fwd_impl(logits, targets, delta_rs, eps)
    return r, s


def _rank_sort_fwd(logits, targets, delta_rs, eps):
    r, s, g = _rank_sort_fwd_impl(logits, targets, delta_rs, eps)
    return (r, s), g


def _rank_sort_bwd(delta_rs, eps, g, cotangents):
    up_r, _ = cotangents
    return g * up_r, None


rank_sort_loss.defvjp(_rank_sort_fwd, _rank_sort_bwd)


def _alrp_fwd_impl(logits, targets, regression_losses, delta, eps):
    fg = targets == 1.0
    fg_f = fg.astype(jnp.float32)
    fg_num = jnp.maximum(fg_f.sum(), 1.0)
    thr = _masked_min(logits, fg) - delta
    bg = (targets == 0.0) & (logits >= thr)
    bg_f = bg.astype(jnp.float32)

    diff = logits[None, :] - logits[:, None]
    R = _rel(diff, delta)
    R = R * (1.0 - jnp.eye(R.shape[0]))              # discard i==j
    R_fg = R * fg_f[None, :]
    R_bg = _rel(diff, delta) * bg_f[None, :]

    rank_pos = 1.0 + R_fg.sum(-1)
    FP_num = R_bg.sum(-1)
    rank = rank_pos + FP_num
    prec = jnp.where(fg, rank_pos / rank, 0.0)

    # reg losses spread over fg columns (reference :323)
    reg = regression_losses * fg_f
    has_fp = FP_num > eps
    fg_grad = jnp.where(
        fg & has_fp, -((R_fg * reg[None, :]).sum(-1) + FP_num) / rank, 0.0)
    bg_grad = (R_bg * jnp.where(
        has_fp, -fg_grad / jnp.maximum(FP_num, 1e-12), 0.0
    )[:, None] * fg_f[:, None]).sum(0)

    grads = jnp.where(fg, fg_grad, jnp.where(bg, bg_grad, 0.0)) / fg_num
    cls_loss = 1.0 - (prec * fg_f).sum() / fg_num
    return cls_loss, rank, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def alrp_loss(logits, targets, regression_losses, delta: float = 1.0,
              eps: float = 1e-5):
    """(cls_loss, rank) — average Localisation-Recall-Precision
    (reference aLRPLoss, utils/loss.py:274-341)."""
    c, r, _ = _alrp_fwd_impl(logits, targets, regression_losses, delta, eps)
    return c, r


def _alrp_fwd(logits, targets, regression_losses, delta, eps):
    c, r, g = _alrp_fwd_impl(logits, targets, regression_losses, delta, eps)
    return (c, r), g


def _alrp_bwd(delta, eps, g, cotangents):
    up_c, _ = cotangents
    return g * up_c, None, None


alrp_loss.defvjp(_alrp_fwd, _alrp_bwd)


def _ap_fwd_impl(logits, targets, delta):
    N = logits.shape[0]
    fg = targets == 1.0
    fg_f = fg.astype(jnp.float32)
    fg_num = jnp.maximum(fg_f.sum(), 1.0)
    thr = _masked_min(logits, fg) - delta
    bg = (targets == 0.0) & (logits >= thr)
    bg_f = bg.astype(jnp.float32)

    diff = logits[None, :] - logits[:, None]
    R = _rel(diff, delta) * (1.0 - jnp.eye(N))
    R_fg = R * fg_f[None, :]
    R_bg = _rel(diff, delta) * bg_f[None, :]

    rank_pos = 1.0 + R_fg.sum(-1)
    FP_num = R_bg.sum(-1)
    rank = rank_pos + FP_num
    cur_prec = jnp.where(fg, rank_pos / rank, 0.0)

    # interpolated precision: running max over ascending-logit fg order
    # (reference :393-400). Non-fg rows get -inf so they never dominate.
    order_key = jnp.where(fg, logits, jnp.inf)       # ascending: fg first
    order = jnp.argsort(order_key)
    prec_sorted = cur_prec[order]
    max_prec_sorted = jax.lax.cummax(prec_sorted)
    inv = jnp.argsort(order)
    max_prec = max_prec_sorted[inv] * fg_f

    is_new_max = max_prec <= cur_prec + 1e-12
    scale = jnp.where(is_new_max, 1.0,
                      (1.0 - max_prec) / jnp.maximum(1.0 - cur_prec, 1e-12))
    bg_grad = (R_bg * (scale / rank)[:, None] * fg_f[:, None]).sum(0)
    fg_grad = jnp.where(fg, -(1.0 - max_prec), 0.0)

    grads = jnp.where(fg, fg_grad, jnp.where(bg, bg_grad, 0.0)) / fg_num
    cls_loss = 1.0 - (max_prec * fg_f).sum() / fg_num
    return cls_loss, grads


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ap_loss(logits, targets, delta: float = 1.0):
    """Interpolated average-precision loss
    (reference APLoss, utils/loss.py:344-421)."""
    c, _ = _ap_fwd_impl(logits, targets, delta)
    return c


def _ap_fwd(logits, targets, delta):
    c, g = _ap_fwd_impl(logits, targets, delta)
    return c, g


def _ap_bwd(delta, g, up):
    return g * up, None


ap_loss.defvjp(_ap_fwd, _ap_bwd)

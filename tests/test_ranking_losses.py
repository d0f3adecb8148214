"""Ranking losses vs direct numpy transcriptions of the reference's
per-positive loops (reference utils/loss.py:176-421)."""

import jax
import jax.numpy as jnp
import numpy as np

from rep_yolo_tpu.train.ranking_losses import alrp_loss, ap_loss, rank_sort_loss


def np_rank_sort(logits, targets, delta=0.5, eps=1e-10):
    grads = np.zeros_like(logits)
    fg = targets > 0
    fgl = logits[fg]
    fgt = targets[fg]
    n = len(fgl)
    thr = fgl.min() - delta
    bg = (targets == 0) & (logits >= thr)
    bgl = logits[bg]
    bg_grad = np.zeros(len(bgl))
    fg_grad = np.zeros(n)
    rank_err = np.zeros(n)
    sort_err = np.zeros(n)
    for ii in range(n):
        fr = np.clip((fgl - fgl[ii]) / (2 * delta) + 0.5, 0, 1)
        br = np.clip((bgl - fgl[ii]) / (2 * delta) + 0.5, 0, 1)
        rank_pos = fr.sum()
        fp = br.sum()
        rank = rank_pos + fp
        rank_err[ii] = fp / rank
        cse = (fr * (1 - fgt)).sum() / rank_pos
        iou_rel = fgt >= fgt[ii]
        tso = iou_rel * fr
        tse = (tso * (1 - fgt)).sum() / tso.sum()
        sort_err[ii] = cse - tse
        if fp > eps:
            fg_grad[ii] -= rank_err[ii]
            bg_grad += br * (rank_err[ii] / fp)
        missorted = (~iou_rel) * fr
        denom = missorted.sum()
        if denom > eps:
            fg_grad[ii] -= sort_err[ii]
            fg_grad += missorted * (sort_err[ii] / denom)
    grads[fg] = fg_grad / n
    grads[bg] = bg_grad / n
    return rank_err.mean(), sort_err.mean(), grads


def np_alrp(logits, targets, reg_losses, delta=1.0, eps=1e-5):
    grads = np.zeros_like(logits)
    fg = targets == 1
    fgl = logits[fg]
    n = len(fgl)
    thr = fgl.min() - delta
    bg = (targets == 0) & (logits >= thr)
    bgl = logits[bg]
    bg_grad = np.zeros(len(bgl))
    fg_grad = np.zeros(n)
    prec = np.zeros(n)
    reg = reg_losses[fg]
    for ii in range(n):
        fr = np.clip((fgl - fgl[ii]) / (2 * delta) + 0.5, 0, 1)
        fr[ii] = 0
        br = np.clip((bgl - fgl[ii]) / (2 * delta) + 0.5, 0, 1)
        rank_pos = 1 + fr.sum()
        fp = br.sum()
        rank = rank_pos + fp
        prec[ii] = rank_pos / rank
        if fp > eps:
            fg_grad[ii] = -((fr * reg).sum() + fp) / rank
            bg_grad += br * (-fg_grad[ii] / fp)
    grads[fg] = fg_grad / n
    grads[bg] = bg_grad / n
    return 1 - prec.mean(), grads


def np_ap(logits, targets, delta=1.0):
    grads = np.zeros_like(logits)
    fg = targets == 1
    fgl = logits[fg]
    n = len(fgl)
    thr = fgl.min() - delta
    bg = (targets == 0) & (logits >= thr)
    bgl = logits[bg]
    bg_grad = np.zeros(len(bgl))
    fg_grad = np.zeros(n)
    prec = np.zeros(n)
    max_prec = 0.0
    for ii in np.argsort(fgl):
        fr = np.clip((fgl - fgl[ii]) / (2 * delta) + 0.5, 0, 1)
        fr[ii] = 0
        br = np.clip((bgl - fgl[ii]) / (2 * delta) + 0.5, 0, 1)
        rank = 1 + fr.sum() + br.sum()
        cur = (1 + fr.sum()) / rank
        if max_prec <= cur:
            max_prec = cur
            bg_grad += br / rank
        else:
            bg_grad += (br / rank) * ((1 - max_prec) / (1 - cur))
        fg_grad[ii] = -(1 - max_prec)
        prec[ii] = max_prec
    grads[fg] = fg_grad / n
    grads[bg] = bg_grad / n
    return 1 - prec.mean(), grads


def _data(seed, n=64, n_fg=12, iou_targets=False):
    rng = np.random.default_rng(seed)
    logits = rng.normal(0, 2, n).astype(np.float32)
    targets = np.zeros(n, np.float32)
    idx = rng.choice(n, n_fg, replace=False)
    targets[idx] = rng.uniform(0.3, 1.0, n_fg) if iou_targets else 1.0
    return logits, targets


def test_rank_sort_matches_reference_loop():
    logits, targets = _data(0, iou_targets=True)
    r_np, s_np, g_np = np_rank_sort(logits, targets)
    r_j, s_j = rank_sort_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(r_j), r_np, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(s_j), s_np, rtol=1e-5, atol=1e-6)
    # grad check (only ranking-error cotangent propagates, as in reference)
    g_j = jax.grad(lambda l: rank_sort_loss(l, jnp.asarray(targets))[0])(
        jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_j), g_np, rtol=1e-5, atol=1e-6)


def test_alrp_matches_reference_loop():
    logits, targets = _data(1)
    reg = np.abs(np.random.default_rng(2).normal(0, 1, len(logits))
                 ).astype(np.float32)
    c_np, g_np = np_alrp(logits, targets, reg)
    c_j, rank = alrp_loss(jnp.asarray(logits), jnp.asarray(targets),
                          jnp.asarray(reg))
    np.testing.assert_allclose(float(c_j), c_np, rtol=1e-5, atol=1e-6)
    g_j = jax.grad(lambda l: alrp_loss(l, jnp.asarray(targets),
                                       jnp.asarray(reg))[0])(
        jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_j), g_np, rtol=1e-5, atol=1e-6)


def test_ap_matches_reference_loop():
    logits, targets = _data(3)
    c_np, g_np = np_ap(logits, targets)
    c_j = ap_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(c_j), c_np, rtol=1e-5, atol=1e-6)
    g_j = jax.grad(lambda l: ap_loss(l, jnp.asarray(targets)))(
        jnp.asarray(logits))
    np.testing.assert_allclose(np.asarray(g_j), g_np, rtol=1e-5, atol=1e-5)

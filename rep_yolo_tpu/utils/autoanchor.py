"""Autoanchor: BPR check + whitened k-means + genetic evolution.

Offline numpy tool (reference utils/autoanchor.py:23-160). Operates on a
DetectionDataset; returns new pixel anchors when the current set's best
possible recall (BPR) is below 0.98, exactly mirroring the reference's
metric and evolution loop.
"""

from __future__ import annotations

import numpy as np


def _label_wh(ds, img_size: int, rng=None, jitter: bool = False) -> np.ndarray:
    """Label (w, h) in pixels after longest-side resize to img_size
    (reference utils/autoanchor.py:28-30,112-113)."""
    whs = []
    for f, l in zip(ds.img_files, ds.labels):
        if l.shape[0] == 0:
            continue
        from PIL import Image

        with Image.open(f) as im:
            w0, h0 = im.size
        r = img_size / max(w0, h0)
        s = np.asarray([w0 * r, h0 * r])
        if jitter and rng is not None:
            s = s * rng.uniform(0.9, 1.1)
        whs.append(l[:, 3:5] * s)
    return (np.concatenate(whs) if whs
            else np.zeros((0, 2), np.float32)).astype(np.float32)


def _metric(k: np.ndarray, wh: np.ndarray):
    r = wh[:, None] / k[None]
    x = np.minimum(r, 1.0 / r).min(2)
    best = x.max(1)
    return x, best


def check_anchors(ds, anchors_px: np.ndarray, img_size: int = 640,
                  thr: float = 4.0, seed: int = 0):
    """-> (bpr, new_anchors_or_None) (reference utils/autoanchor.py:23-59)."""
    rng = np.random.default_rng(seed)
    wh = _label_wh(ds, img_size, rng, jitter=True)
    if wh.shape[0] == 0:
        return 1.0, None
    k = anchors_px.reshape(-1, 2)
    x, best = _metric(k, wh)
    bpr = float((best > 1.0 / thr).mean())
    if bpr >= 0.98:
        return bpr, None
    new = kmean_anchors(ds, n=k.shape[0], img_size=img_size, thr=thr,
                        gen=1000, seed=seed)
    _, best_new = _metric(new, wh)
    if float((best_new > 1.0 / thr).mean()) > bpr:
        return bpr, new
    return bpr, None


def kmean_anchors(ds, n: int = 9, img_size: int = 640, thr: float = 4.0,
                  gen: int = 1000, seed: int = 0) -> np.ndarray:
    """Whitened k-means + 1000-gen genetic evolution
    (reference utils/autoanchor.py:62-160)."""
    from scipy.cluster.vq import kmeans

    inv_thr = 1.0 / thr
    rng = np.random.default_rng(seed)
    wh0 = _label_wh(ds, img_size)
    wh = wh0[(wh0 >= 2.0).any(1)]
    assert wh.shape[0] >= n, f"too few labels ({wh.shape[0]}) for {n} anchors"

    def fitness(k):
        _, best = _metric(k, wh)
        return float((best * (best > inv_thr)).mean())

    s = wh.std(0)
    k, _ = kmeans(wh / s, n, iter=30, seed=seed)
    assert len(k) == n, "kmeans returned fewer centroids than requested"
    k = k * s

    f, shape, mp, sigma = fitness(k), k.shape, 0.9, 0.1
    for _ in range(gen):
        v = np.ones(shape)
        while (v == 1).all():
            v = ((rng.random(shape) < mp) * rng.random()
                 * rng.standard_normal(shape) * sigma + 1).clip(0.3, 3.0)
        kg = (k.copy() * v).clip(min=2.0)
        fg = fitness(kg)
        if fg > f:
            f, k = fg, kg.copy()

    return k[np.argsort(k.prod(1))].astype(np.float32)

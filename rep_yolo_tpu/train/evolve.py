"""Hyperparameter evolution — the reference's 300-generation genetic loop
(reference train.py:628-715): per-key (gain, lo, hi) mutation metadata,
fitness-weighted parent selection from the top-5 of evolve.txt, mutation
with sigma=0.2 / 80%-per-key probability, then retrain + select.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

# {key: (mutation gain, lower, upper)} — reference train.py:631-661
META: dict[str, tuple[float, float, float]] = {
    "lr0": (1, 1e-5, 1e-1),
    "lrf": (1, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1, 0.0, 0.001),
    "warmup_epochs": (1, 0.0, 5.0),
    "warmup_momentum": (1, 0.0, 0.95),
    "warmup_bias_lr": (1, 0.0, 0.2),
    "box": (1, 0.02, 0.2),
    "cls": (1, 0.2, 4.0),
    "cls_pw": (1, 0.5, 2.0),
    "obj": (1, 0.2, 4.0),
    "obj_pw": (1, 0.5, 2.0),
    "iou_t": (0, 0.1, 0.7),
    "anchor_t": (1, 2.0, 8.0),
    "fl_gamma": (0, 0.0, 2.0),
    "hsv_h": (1, 0.0, 0.1),
    "hsv_s": (1, 0.0, 0.9),
    "hsv_v": (1, 0.0, 0.9),
    "degrees": (1, 0.0, 45.0),
    "translate": (1, 0.0, 0.9),
    "scale": (1, 0.0, 0.9),
    "shear": (1, 0.0, 10.0),
    "perspective": (0, 0.0, 0.001),
    "flipud": (1, 0.0, 1.0),
    "fliplr": (0, 0.0, 1.0),
    "mosaic": (1, 0.0, 1.0),
    "mixup": (1, 0.0, 1.0),
    "copy_paste": (1, 0.0, 1.0),
    "paste_in": (1, 0.0, 1.0),
}


def mutate(hyp: dict, evolve_file: Path, rng: random.Random | None = None,
           mp: float = 0.8, s: float = 0.2) -> dict:
    """One mutation step (reference train.py:664-689): select a parent from
    the top-5 rows of evolve_file (fitness-weighted), then mutate."""
    rng = rng or random.Random()
    hyp = dict(hyp)
    if evolve_file.exists():
        x = np.loadtxt(str(evolve_file), ndmin=2)
        n = min(5, len(x))
        x = x[np.argsort(-fitness_col(x))][:n]
        w = fitness_col(x) - fitness_col(x).min() + 1e-6
        # weighted combination parent selection ('weighted' branch)
        parent = (x[:, 4:] * w.reshape(n, 1)).sum(0) / w.sum()
        for i, k in enumerate(META):
            hyp[k] = float(parent[i])

    npr = np.random.RandomState(rng.randint(0, 2 ** 31 - 1))
    g = np.asarray([META[k][0] for k in META])
    ng = len(META)
    v = np.ones(ng)
    while all(v == 1):
        v = (g * (npr.random(ng) < mp) * npr.randn(ng) * npr.random() * s
             + 1).clip(0.3, 3.0)
    for i, k in enumerate(META):
        hyp[k] = float(hyp[k] * v[i])
        hyp[k] = max(hyp[k], META[k][1])
        hyp[k] = min(hyp[k], META[k][2])
        hyp[k] = round(hyp[k], 5)
    return hyp


def fitness_col(x: np.ndarray) -> np.ndarray:
    """Row fitness = 0.1*mAP50 + 0.9*mAP from [P,R,mAP50,mAP,...] rows."""
    return 0.1 * x[:, 2] + 0.9 * x[:, 3]


def append_result(evolve_file: Path, results: tuple, hyp: dict):
    """Append one generation row: [P, R, mAP50, mAP] + hyp values."""
    row = list(results[:4]) + [hyp[k] for k in META]
    with open(evolve_file, "a") as f:
        f.write(" ".join(f"{v:.6g}" for v in row) + "\n")


def evolve(train_once, base_hyp: dict, generations: int = 300,
           out_dir: str | Path = "runs/evolve", seed: int = 0) -> dict:
    """Run the evolution meta-loop. `train_once(hyp) -> (P, R, mAP50, mAP)`
    trains (typically few epochs) and evaluates. Returns the best hyp."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    evolve_file = out_dir / "evolve.txt"
    rng = random.Random(seed)
    best_hyp, best_fit = dict(base_hyp), -1.0
    for gen in range(generations):
        hyp = mutate(base_hyp, evolve_file, rng)
        results = train_once(hyp)
        append_result(evolve_file, results, hyp)
        fit = 0.1 * results[2] + 0.9 * results[3]
        if fit > best_fit:
            best_fit, best_hyp = fit, dict(hyp)
    return best_hyp

"""Plotting / visual-check utilities (reference utils/plots.py subset:
plot_one_box :61, plot_images mosaics :114, plot_labels :275,
plot_results :389, PR/F1 curves from utils/metrics.py:160-223).

All matplotlib/cv2, host-side, optional (import-guarded by callers).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def plot_one_box(box, img, color=(0, 255, 0), label: str | None = None,
                 line_thickness: int = 2):
    """Draw one xyxy box on a BGR numpy image in place."""
    import cv2

    p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
    cv2.rectangle(img, p1, p2, color, line_thickness, cv2.LINE_AA)
    if label:
        cv2.putText(img, label, (p1[0], p1[1] - 4),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 1, cv2.LINE_AA)


def plot_images(images: np.ndarray, labels: np.ndarray, mask: np.ndarray,
                path: str | Path, max_subplots: int = 16):
    """Save a grid of train images with their (normalized xywh) boxes —
    the first-batches visual check (reference train.py:401-403)."""
    import cv2

    B, H, W, _ = images.shape
    n = min(B, max_subplots)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    canvas = np.full((rows * H, cols * W, 3), 255, np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        img = images[i]
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        img = img[..., ::-1].copy()  # RGB -> BGR for cv2
        for j in range(labels.shape[1]):
            if not mask[i, j]:
                continue
            cls, xc, yc, bw, bh = labels[i, j]
            box = ((xc - bw / 2) * W, (yc - bh / 2) * H,
                   (xc + bw / 2) * W, (yc + bh / 2) * H)
            plot_one_box(box, img, label=str(int(cls)))
        canvas[r * H:(r + 1) * H, c * W:(c + 1) * W] = img
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), canvas)


def plot_labels(labels_list, save_dir: str | Path, nc: int = 1):
    """Class/box-geometry histograms (reference utils/plots.py:275-320)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    all_l = np.concatenate([l for l in labels_list if len(l)], 0) \
        if any(len(l) for l in labels_list) else np.zeros((0, 5))
    fig, ax = plt.subplots(2, 2, figsize=(8, 8), tight_layout=True)
    ax = ax.ravel()
    ax[0].hist(all_l[:, 0], bins=max(nc, 2))
    ax[0].set_xlabel("class")
    ax[1].scatter(all_l[:, 1], all_l[:, 2], s=3, alpha=0.4)
    ax[1].set_xlabel("x")
    ax[1].set_ylabel("y")
    ax[2].scatter(all_l[:, 3], all_l[:, 4], s=3, alpha=0.4)
    ax[2].set_xlabel("w")
    ax[2].set_ylabel("h")
    ax[3].hist2d(all_l[:, 3], all_l[:, 4], bins=32)
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_dir / "labels.png", dpi=150)
    plt.close(fig)


def plot_pr_curve(px, py, ap, save_path: str | Path, names=()):
    """PR curve at mAP@0.5 (reference utils/metrics.py:160-180)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(7, 6), tight_layout=True)
    py = np.stack(py, axis=1) if isinstance(py, list) and py else py
    if py is not None and len(py):
        ax.plot(px, py, linewidth=1)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.set_title(f"mAP@0.5 = {np.mean(ap):.3f}")
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)


def plot_mc_curve(px, py, save_path: str | Path, xlabel="Confidence",
                  ylabel="Metric"):
    """Metric-confidence curve (F1/P/R vs conf; reference
    utils/metrics.py:183-199 plot_mc_curve)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(7, 6), tight_layout=True)
    py = np.atleast_2d(py)
    for row in py:
        ax.plot(px, row, linewidth=1)
    mean = py.mean(0)
    ax.plot(px, mean, linewidth=3,
            label=f"all classes {mean.max():.2f} at "
                  f"{px[mean.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend()
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)


def plot_confusion_matrix(matrix: np.ndarray, save_path: str | Path,
                          names=()):
    """Normalized confusion-matrix heatmap (reference
    utils/metrics.py:128-157 ConfusionMatrix.plot)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = matrix / (matrix.sum(0).reshape(1, -1) + 1e-6)
    fig, ax = plt.subplots(1, 1, figsize=(8, 7), tight_layout=True)
    im = ax.imshow(m, cmap="Blues", vmin=0, vmax=1)
    fig.colorbar(im, ax=ax)
    n = m.shape[0]
    labels = list(names) + ["background"] if len(names) == n - 1 else None
    if labels:
        ax.set_xticks(range(n))
        ax.set_yticks(range(n))
        ax.set_xticklabels(labels, rotation=90, fontsize=8)
        ax.set_yticklabels(labels, fontsize=8)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)


def plot_evolve(evolve_file: str | Path, save_path: str | Path,
                meta_keys=None):
    """Fitness-vs-hyperparameter scatter grid (reference
    utils/plots.py plot_evolution)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = np.asarray([
        [float(v) for v in line.split()]
        for line in Path(evolve_file).read_text().splitlines() if line])
    if rows.size == 0:
        return
    fitness = 0.1 * rows[:, 2] + 0.9 * rows[:, 3]
    hyps = rows[:, 4:]
    k = hyps.shape[1]
    cols = 5
    rows_n = -(-k // cols)
    fig, axes = plt.subplots(rows_n, cols, figsize=(3 * cols, 3 * rows_n),
                             tight_layout=True)
    axes = np.atleast_2d(axes)
    for i in range(k):
        ax = axes[i // cols][i % cols]
        ax.scatter(hyps[:, i], fitness, c=fitness, cmap="viridis", s=12)
        if meta_keys and i < len(meta_keys):
            ax.set_title(meta_keys[i], fontsize=8)
    Path(save_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)


def plot_results(results_file: str | Path, save_path: str | Path):
    """Loss curves from results.txt (reference utils/plots.py:389-434)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    for line in Path(results_file).read_text().splitlines():
        parts = line.split()
        try:
            vals = [float(parts[i]) for i in (3, 5, 7, 9)]
            rows.append(vals)
        except (IndexError, ValueError):
            continue
    if not rows:
        return
    arr = np.asarray(rows)
    fig, ax = plt.subplots(1, 4, figsize=(14, 3), tight_layout=True)
    for i, name in enumerate(["box", "obj", "cls", "total"]):
        ax[i].plot(arr[:, i])
        ax[i].set_title(name)
    fig.savefig(save_path, dpi=150)
    plt.close(fig)

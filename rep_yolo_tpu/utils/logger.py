"""Training observability: TensorBoard scalars + CSV + run-dir snapshots.

The reference logs 13 scalar tags per epoch to TensorBoard and appends
results.txt (reference train.py:439-453,625), with W&B optional. Here:
TensorBoard via torch.utils.tensorboard when available (torch-CPU ships
with the image), always a plain metrics.csv fallback — no network deps.
"""

from __future__ import annotations

import csv
import json
from pathlib import Path
from typing import Mapping


class RunLogger:
    def __init__(self, log_dir: str | Path, wandb_project: str | None = None):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._csv_path = self.dir / "metrics.csv"
        self._csv_fields: list[str] | None = None
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=str(self.dir / "tb"))
        except Exception:
            self._tb = None
        # optional W&B (the reference's WandbLogger surface,
        # utils/wandb_logging/wandb_utils.py:80-303); never required
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project,
                                         dir=str(self.dir), resume="allow")
            except Exception:
                self._wandb = None

    def log_scalars(self, step: int, scalars: Mapping[str, float]):
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(dict(scalars), step=step)
        row = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        write_header = not self._csv_path.exists() or self._csv_fields is None
        if self._csv_fields is None:
            self._csv_fields = list(row.keys())
        with open(self._csv_path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._csv_fields,
                               extrasaction="ignore")
            if write_header and f.tell() == 0:
                w.writeheader()
            w.writerow(row)

    def log_config(self, name: str, cfg: dict):
        (self.dir / f"{name}.json").write_text(json.dumps(cfg, indent=2,
                                                          default=str))

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()

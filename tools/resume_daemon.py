"""Preemption-resume daemon for unattended training.

Counterpart of the reference's AWS spot-instance resume loop
(reference utils/aws/resume.py:10-37): scan `runs/train/*/last.*`
checkpoints whose runs did not reach their target epochs and relaunch
training with --resume. On TPU pods the analogous events are VM
preemptions / maintenance, and relaunch is a plain process exec — the
JAX single-controller model needs no torch.distributed.launch command
reconstruction.

Usage (e.g. from a boot-time systemd unit or cron):
  python tools/resume_daemon.py --root runs/train [--once]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path


def find_unfinished(root: Path) -> list[tuple[Path, dict]]:
    out = []
    for meta_path in sorted(root.glob("*/last.json")):
        run_dir = meta_path.parent
        try:
            meta = json.loads(meta_path.read_text())
            opt = json.loads((run_dir / "opt.json").read_text())
        except Exception:
            continue
        if meta.get("epoch", 0) + 1 < opt.get("epochs", 0):
            out.append((run_dir, opt))
    return out


def relaunch(run_dir: Path, opt: dict) -> int:
    cmd = [sys.executable, "-m", "rep_yolo_tpu.cli.train",
           "--resume", str(run_dir / "last"),
           "--data", opt["data"], "--cfg", opt["cfg"],
           "--epochs", str(opt["epochs"]),
           "--batch-size", str(opt["batch_size"]),
           "--img-size", str(opt["img_size"]),
           "--project", str(run_dir.parent), "--name", run_dir.name]
    print("relaunch:", " ".join(cmd))
    return subprocess.call(cmd)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="runs/train")
    p.add_argument("--interval", type=float, default=300.0)
    p.add_argument("--once", action="store_true")
    args = p.parse_args(argv)

    while True:
        for run_dir, opt in find_unfinished(Path(args.root)):
            relaunch(run_dir, opt)
        if args.once:
            break
        time.sleep(args.interval)


if __name__ == "__main__":
    main()

"""Evaluation CLI — the reference test.py equivalent (reference
test.py:288-352): mAP over a dataset with the eval NMS settings, plus a
--task speed mode (fixed 0.25/0.45 thresholds, reference test.py:335-337).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser("rep-yolo-tpu test")
    p.add_argument("--weights", default=None)
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--data", required=True, help="dataset dir (YOLO layout)")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.65)
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--task", default="val",
                   choices=["val", "test", "speed", "study"])
    p.add_argument("--save-json", default=None,
                   help="write COCO-format detections to this path "
                        "(reference test.py --save-json)")
    p.add_argument("--coco-gt", default=None,
                   help="COCO GT annotations json: run the pycocotools "
                        "cross-check (reference test.py:253-275)")
    p.add_argument("--verbose", action="store_true",
                   help="per-class P/R/AP table (reference test.py:231-236)")
    p.add_argument("--no-fuse", action="store_true")
    p.add_argument("--fast", default=None, choices=["int8"],
                   help="serving fast path: calibrate on the first images "
                        "and run backbone DERs through the int8-resident "
                        "Pallas kernels (TPU analog of TRT int8 serving)")
    p.add_argument("--rect", action="store_true",
                   help="aspect-bucketed rectangular eval batches "
                        "(reference test.py:91 rect=True); one compiled "
                        "program per bucket shape")
    p.add_argument("--rect-stride", type=int, default=64,
                   help="bucket-shape quantum (model stride multiple); "
                        "coarser = fewer compiles, more padding")
    p.add_argument("--plots-dir", default="runs/test",
                   help="save confusion_matrix.png + PR/P/R/F1 curves here "
                        "(reference test.py:213-217,245); '' disables")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from rep_yolo_tpu.cli.detect import load_model_and_vars
    from rep_yolo_tpu.data.datasets import DetectionDataset
    from rep_yolo_tpu.train.evaluate import evaluate

    if args.task == "speed":   # reference test.py:335-337
        args.conf_thres, args.iou_thres = 0.25, 0.45

    # dataset YAML (reference data/*.yaml): resolves nc/names/split
    # paths BEFORE the model is built (nc shapes the head)
    names = None
    data_path = args.data
    if data_path.endswith((".yaml", ".yml")):
        from rep_yolo_tpu.data.datasets import load_dataset_spec

        spec = load_dataset_spec(data_path)
        args.nc = spec["nc"]
        names = spec["names"] or None
        data_path = (spec["test"] if args.task == "test" and spec["test"]
                     else spec["val"])

    model, variables = load_model_and_vars(args)

    if args.task == "study":   # resolution sweep (reference test.py:339-352)
        rows = []
        for sz in range(256, 1536 + 128, 128):
            ds = DetectionDataset.from_path(data_path, sz, args.nc)
            res = evaluate(model, variables, ds,
                           batch_size=args.batch_size, img_size=sz,
                           conf_thres=args.conf_thres,
                           iou_thres=args.iou_thres)
            rows.append([sz, res.mp, res.mr, res.map50, res.map,
                         res.speed_ms[0], res.speed_ms[1]])
            print(f"study @{sz}px: mAP50={res.map50:.4f} "
                  f"mAP={res.map:.4f} {res.speed_ms[0]:.1f} ms/img")
        out_file = Path(f"study_{Path(args.data).name}.txt")
        out_file.write_text("\n".join(
            " ".join(f"{v:.6g}" for v in r) for r in rows) + "\n")
        print(f"saved {out_file}")
        return rows

    ds = DetectionDataset.from_path(data_path, args.img_size, args.nc)
    if args.fast == "int8" and not args.no_fuse:
        import jax.numpy as jnp
        import numpy as np

        from rep_yolo_tpu.cli.detect import enable_int8_fast_path
        from rep_yolo_tpu.data.augment import letterbox_batch

        items = [ds.load_item(i) for i in range(min(8, len(ds)))]
        cal, _, _ = letterbox_batch(
            jnp.asarray(np.stack([it[0] for it in items])),
            jnp.asarray(np.stack([it[1] for it in items])), args.img_size)
        enable_int8_fast_path(model, variables, cal)
    plots_dir = None
    if args.plots_dir and args.task != "speed":   # speed mode: no plots
        from rep_yolo_tpu.utils.general import increment_path

        plots_dir = increment_path(Path(args.plots_dir) / "exp")
    res = evaluate(model, variables, ds, batch_size=args.batch_size,
                   img_size=args.img_size, conf_thres=args.conf_thres,
                   iou_thres=args.iou_thres, save_json=args.save_json,
                   rect=args.rect, rect_stride=args.rect_stride,
                   plots_dir=plots_dir, names=tuple(names or ()))
    if plots_dir:
        print(f"eval plots in {plots_dir}")
    out = dict(P=res.mp, R=res.mr, map50=res.map50, map=res.map,
               fitness=res.fitness,
               ms_per_img_infer=res.speed_ms[0],
               ms_per_img_total=res.speed_ms[1])
    if args.verbose and res.per_class:
        print(f"{'class':>12} {'P':>8} {'R':>8} {'AP50':>8} {'AP':>8}")
        for c, d in sorted(res.per_class.items()):
            label = names[c] if names and 0 <= c < len(names) else str(c)
            print(f"{label:>12} {d['p']:8.3f} {d['r']:8.3f} "
                  f"{d['ap50']:8.3f} {d['ap']:8.3f}")
    if args.save_json and args.coco_gt:
        from rep_yolo_tpu.train.evaluate import coco_eval

        try:
            out["coco_map"], out["coco_map50"] = coco_eval(
                args.save_json, args.coco_gt)
        except ImportError:
            print("pycocotools not available; skipping COCO cross-check")
    print(json.dumps(out, indent=2))
    return res


if __name__ == "__main__":
    main()

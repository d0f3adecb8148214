"""Cross-framework eval-protocol A/B: same weights, same images — our
`evaluate()` (square letterbox, fixed-shape batches, on-device NMS) vs
the reference's `test.test()` (rect=True pad=0.5 aspect-bucketed batches,
CPU torch; reference test.py:91,176-210).

The reference runs from /root/reference with torchvision.ops.nms shimmed
by an exact greedy CPU NMS (torchvision is not installed here); weights
cross via utils.torch_import.export_torch_state.

Usage:
  python tools/eval_parity.py [--ckpt runs/train/exp/best] [--n 48]
      [--img 640] [--data DIR] [--out EVAL_PARITY.md]

Without --ckpt the model is random-init (protocol smoke only — mAPs are
near zero on both sides); with a trained checkpoint this is the real
rect-vs-square / NMS / matching tolerance measurement.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
from types import SimpleNamespace

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
REF = pathlib.Path("/root/reference")


def _greedy_nms_shim():
    """Install a torchvision stub whose ops.nms is an exact greedy NMS
    (descending-score suppression, IoU > thresh removed) — the same
    contract as torchvision.ops.nms."""
    import types

    import torch
    import torch.nn as nn

    # the reference pickles numpy objects into its labels.cache; torch
    # >=2.6 defaults weights_only=True and refuses them — restore the old
    # default ONLY for files outside /root/reference (i.e. the caches and
    # weights this tool itself generates locally). Anything pickled inside
    # the untrusted reference tree keeps the safe default: a stale
    # reference-side *.cache must not get arbitrary-code deserialization.
    _orig_load = torch.load

    def _load(f, *a, **k):
        p = str(getattr(f, "name", f))
        try:
            inside_ref = pathlib.Path(p).resolve().is_relative_to(REF)
        except (OSError, ValueError, TypeError):
            inside_ref = True  # unresolvable path: keep the safe default
        if not inside_ref:
            k.setdefault("weights_only", False)
        return _orig_load(f, *a, **k)

    torch.load = _load

    def nms(boxes: "torch.Tensor", scores: "torch.Tensor", iou_threshold):
        order = scores.argsort(descending=True)
        keep = []
        while order.numel() > 0:
            i = order[0]
            keep.append(i.item())
            if order.numel() == 1:
                break
            rest = order[1:]
            b = boxes[i]
            bb = boxes[rest]
            x1 = torch.maximum(b[0], bb[:, 0])
            y1 = torch.maximum(b[1], bb[:, 1])
            x2 = torch.minimum(b[2], bb[:, 2])
            y2 = torch.minimum(b[3], bb[:, 3])
            inter = (x2 - x1).clamp(min=0) * (y2 - y1).clamp(min=0)
            a1 = (b[2] - b[0]) * (b[3] - b[1])
            a2 = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
            iou = inter / (a1 + a2 - inter)
            order = rest[iou <= iou_threshold]
        return torch.tensor(keep, dtype=torch.long)

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")

    class DeformConv2d(nn.Module):
        pass

    ops.nms = nms
    ops.DeformConv2d = DeformConv2d
    ops.roi_pool = ops.roi_align = ops.ps_roi_pool = ops.ps_roi_align = nms
    utils_mod = types.ModuleType("torchvision.utils")
    utils_mod.save_image = None
    transforms = types.ModuleType("torchvision.transforms")
    transforms.ToTensor = object
    tv.ops = ops
    tv.utils = utils_mod
    tv.transforms = transforms
    tv.__path__ = []
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.ops", ops)
    sys.modules.setdefault("torchvision.utils", utils_mod)
    sys.modules.setdefault("torchvision.transforms", transforms)
    for name in ("requests", "seaborn", "wandb"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            if name == "requests":
                mod.get = None
            sys.modules[name] = mod


def run_ours(args, ds, variables, rect=False):
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.train.evaluate import evaluate

    model = RepYOLO.from_config(args.cfg, nc=args.nc)
    res = evaluate(model, variables, ds, batch_size=args.batch,
                   img_size=args.img, conf_thres=0.001, iou_thres=0.6,
                   rect=rect, rect_stride=32)
    return dict(mp=res.mp, mr=res.mr, map50=res.map50, map=res.map)


def run_reference(args, img_dir, torch_state):
    sys.path.insert(0, str(REF))
    _greedy_nms_shim()
    # the reference targets numpy<1.24: restore the removed aliases
    for name, py in (("int", int), ("float", float), ("bool", bool),
                     ("object", object)):
        if not hasattr(np, name):
            setattr(np, name, py)
    import torch

    from models.yolo import Model  # reference package

    import test as ref_test
    from utils.datasets import create_dataloader

    torch.manual_seed(0)
    model = Model(str(REF / "cfg/training/Rep-YOLO.yaml"), ch=3, nc=args.nc)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in torch_state.items()}
    missing, unexpected = model.load_state_dict(sd, strict=False)
    # tolerated-missing: anchors (buffers, come from the cfg) and the
    # reference DER_Block's dead cv3_1/cv3_2 convs (defined at
    # models/common.py:3554-3555 but never used in forward :3646-3654 —
    # our build has no counterpart, and their random init can't affect
    # the reference forward)
    # ... and VoVGSCSP's dead `res` conv (common.py:3854, unused in
    # forward :3857-3860)
    dead = (".cv3_1.", ".cv3_2.", ".res.")
    skip = [k for k in missing
            if "anchor" not in k and not any(d in k for d in dead)]
    assert not skip, f"missing reference keys: {skip[:8]}"
    model.float().eval()
    model.names = [str(i) for i in range(args.nc)]
    model.gr = 1.0
    model.hyp = {"box": 0.05, "obj": 0.7, "cls": 0.3, "cls_pw": 1.0,
                 "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0}

    opt_stub = SimpleNamespace(single_cls=False)
    loader = create_dataloader(str(img_dir), args.img, args.batch, 32,
                               opt_stub, pad=0.5, rect=True)[0]
    data = {"val": str(img_dir), "nc": args.nc,
            "names": model.names}
    (res, maps, t) = ref_test.test(
        data, batch_size=args.batch, imgsz=args.img, conf_thres=0.001,
        iou_thres=0.6, model=model, dataloader=loader,
        save_dir=pathlib.Path("/tmp/ref_eval"), plots=False,
        half_precision=False)
    mp, mr, map50, mmap = res[:4]
    return dict(mp=float(mp), mr=float(mr), map50=float(map50),
                map=float(mmap))


def main(argv=None):
    p = argparse.ArgumentParser("eval_parity")
    p.add_argument("--ckpt", default=None,
                   help="TrainState checkpoint (uses EMA weights)")
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--data", default=None, help="existing YOLO-layout dir")
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--out", default="EVAL_PARITY.md")
    args = p.parse_args(argv)

    import jax

    from rep_yolo_tpu.data.datasets import (DetectionDataset,
                                            make_synthetic_dataset)
    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.utils.torch_import import export_torch_state

    if args.data:
        data_dir = pathlib.Path(args.data)
        ds = DetectionDataset.from_path(data_dir, args.img, args.nc, 120)
    else:
        data_dir = pathlib.Path("/tmp/eval_parity_data")
        ds = make_synthetic_dataset(args.n, args.img, args.nc, 120, seed=7,
                                    root=data_dir)

    model = RepYOLO.from_config(args.cfg, nc=args.nc)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = model.init(jax.random.PRNGKey(0), img_size=args.img)
    if args.ckpt:
        from rep_yolo_tpu.train.checkpoint import load_checkpoint
        from rep_yolo_tpu.train.trainer import create_train_state

        # the ckpt may have been written with or without the gradient-
        # accumulation fields; try both TrainState templates
        try:
            state = load_checkpoint(
                args.ckpt, create_train_state(variables,
                                              jax.random.PRNGKey(0)))
        except Exception:
            state = load_checkpoint(
                args.ckpt, create_train_state(variables,
                                              jax.random.PRNGKey(0),
                                              accumulate=True))
        variables = {"params": state.ema.variables["params"],
                     "batch_stats": state.ema.variables["batch_stats"]}
        variables = jax.tree.map(np.asarray, variables)

    # reference first: it is the side with environment hazards (shims,
    # dead-module key sets, numpy compat) — fail fast before paying for
    # our full eval
    torch_state = export_torch_state(variables)
    ref = run_reference(args, data_dir / "images", torch_state)
    print(f"reference: P {ref['mp']:.4f} R {ref['mr']:.4f} "
          f"mAP50 {ref['map50']:.4f} mAP {ref['map']:.4f}", flush=True)

    ours = run_ours(args, ds, variables)
    print(f"ours:      P {ours['mp']:.4f} R {ours['mr']:.4f} "
          f"mAP50 {ours['map50']:.4f} mAP {ours['map']:.4f}", flush=True)
    ours_r = run_ours(args, ds, variables, rect=True)
    print(f"ours rect: P {ours_r['mp']:.4f} R {ours_r['mr']:.4f} "
          f"mAP50 {ours_r['map50']:.4f} mAP {ours_r['map']:.4f}",
          flush=True)

    d50 = abs(ours["map50"] - ref["map50"])
    dmap = abs(ours["map"] - ref["map"])
    d50r = abs(ours_r["map50"] - ref["map50"])
    dmapr = abs(ours_r["map"] - ref["map"])
    lines = [
        "# Eval-protocol parity: ours vs reference test.py",
        "",
        f"Same weights ({'ckpt ' + args.ckpt if args.ckpt else 'random init'}),"
        f" same {len(ds)} images at {args.img}px, conf 0.001 / NMS IoU 0.6.",
        "Weights cross frameworks via utils/torch_import.export_torch_state.",
        "Reference: rect=True pad=0.5 aspect-bucketed batches, greedy CPU",
        "NMS (torchvision shim), reference test.py matching loop.",
        "Ours is measured both ways: square letterbox and rect buckets",
        "(`evaluate(rect=True, rect_stride=32)`), on-device NMS.",
        "",
        "| protocol | P | R | mAP@.5 | mAP@.5:.95 |",
        "|---|---|---|---|---|",
        f"| reference test.test() rect      | {ref['mp']:.4f} |"
        f" {ref['mr']:.4f} | {ref['map50']:.4f} | {ref['map']:.4f} |",
        f"| rep_yolo_tpu evaluate() square  | {ours['mp']:.4f} |"
        f" {ours['mr']:.4f} | {ours['map50']:.4f} | {ours['map']:.4f} |",
        f"| rep_yolo_tpu evaluate() rect    | {ours_r['mp']:.4f} |"
        f" {ours_r['mr']:.4f} | {ours_r['map50']:.4f} | {ours_r['map']:.4f} |",
        "",
        f"square: |Δ mAP@.5| = {d50:.4f}, |Δ mAP@.5:.95| = {dmap:.4f}",
        f"**rect:   |Δ mAP@.5| = {d50r:.4f}, |Δ mAP@.5:.95| = {dmapr:.4f}**"
        f" (target ≤ 0.01 per VERDICT r1 #5; ≤ 0.1 per the north star).",
    ]
    pathlib.Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}: d_map50={d50:.4f} d_map={dmap:.4f}")
    return d50, dmap


if __name__ == "__main__":
    main()

"""Export CLI — the reference export.py counterpart (reference
export.py:19-196), TPU-native: instead of ONNX/CoreML/TensorRT graphs,
the fused deploy model (optionally with NMS compiled in, the
`--include-nms` analog of the reference's End2End wrapper,
models/experimental.py:216) is serialized with `jax.export` to StableHLO
bytes + a params npz. Reload anywhere with jax.export.deserialize.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("rep-yolo-tpu export")
    p.add_argument("--weights", default=None, help="train-state checkpoint")
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--include-nms", action="store_true",
                   help="compile NMS into the exported graph (End2End)")
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    p.add_argument("--bf16", action="store_true", help="bf16 params/compute")
    p.add_argument("--out", default="runs/export/model")
    return p.parse_args(argv)


def export_model(model, fused_vars, img_size: int, batch: int,
                 include_nms: bool, conf: float, iou: float,
                 bf16: bool, out: Path):
    from jax import export as jexport

    from rep_yolo_tpu.ops.nms import non_max_suppression

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    if bf16:
        fused_vars = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            fused_vars)

    def fn(x):
        pred = model.predict(fused_vars, x)
        if include_nms:
            return non_max_suppression(
                pred.astype(jnp.float32), conf, iou, max_nms=1024,
                nc=model.cfg.nc)
        return pred

    spec = jax.ShapeDtypeStruct((batch, img_size, img_size, 3), dtype)
    exported = jexport.export(jax.jit(fn))(spec)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.with_suffix(".stablehlo").write_bytes(exported.serialize())

    flat = {}

    def walk(tree, prefix=""):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, f"{prefix}{k}/")
        else:
            flat[prefix[:-1]] = np.asarray(tree)

    walk(fused_vars)
    np.savez(str(out.with_suffix(".params.npz")), **flat)
    meta = dict(img_size=img_size, batch=batch, include_nms=include_nms,
                nc=model.cfg.nc, strides=list(model.strides),
                anchors=np.asarray(model.anchors_px).tolist(),
                dtype=str(dtype.__name__))
    out.with_suffix(".json").write_text(json.dumps(meta, indent=2))
    return out


def main(argv=None):
    args = parse_args(argv)
    args.no_fuse = False
    from rep_yolo_tpu.cli.detect import load_model_and_vars

    model, variables = load_model_and_vars(args)  # fuses by default
    out = export_model(model, variables, args.img_size, args.batch_size,
                       args.include_nms, args.conf_thres, args.iou_thres,
                       args.bf16, Path(args.out))
    print(f"exported to {out}.stablehlo / .params.npz / .json")


if __name__ == "__main__":
    main()

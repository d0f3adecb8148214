"""Offline reparameterization: train checkpoint -> deploy checkpoint.

The TPU-native equivalent of the reference's weight-transform script
(reference tools/Reparameterization.py:41-91): where the reference loads a
pickled nn.Module, intersects state dicts against a deploy-cfg model and
folds YOLOR implicits by hard-coded layer index, here the whole transform
is the pure pytree function `fuse_variables` (rep_yolo_tpu/nn/fuse.py) —
RepConv/RepS/DER collapse, Conv+BN fold, implicit-knowledge fold — applied
to a pure-data checkpoint, then saved in bf16 ("half" per the reference's
:86-91) alongside deploy metadata.

Usage:
  python tools/reparameterize.py --cfg cfg/rep_yolo.yaml \
      --ckpt runs/train/exp/weights/best --out deploy_weights
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--ckpt", required=True,
                   help="checkpoint path (as written by train; EMA weights)")
    p.add_argument("--out", required=True, help="output path stem")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--fp32", action="store_true",
                   help="keep fp32 (default: bf16 like the reference's .half())")
    args = p.parse_args(argv)

    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = RepYOLO.from_config(args.cfg)
    template = model.init(jax.random.PRNGKey(0), img_size=256)
    variables = load_checkpoint(args.ckpt, template)

    deploy_model, fused = model.fuse(variables)
    if not args.fp32:
        fused = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, fused)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(fused["params"]))
    save_checkpoint(args.out, fused, meta={
        "cfg": str(args.cfg), "deploy": True,
        "dtype": "float32" if args.fp32 else "bfloat16",
        "img_size": args.img_size, "params": n_params,
        "strides": list(model.strides),
        "anchors_px": np.asarray(model.anchors_px).tolist(),
    })
    print(f"saved deploy checkpoint: {args.out} ({n_params/1e6:.2f}M params)")


if __name__ == "__main__":
    main()

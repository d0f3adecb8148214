"""Structured L1 channel pruning as a pure pytree transform.

TPU-native counterpart of the reference's torch_pruning script
(reference tools/prunmodel.py:41-98: L1-norm structured pruning of
backbone convs at amount=0.8, with a dependency graph and a per-layer
log). On TPU, physically shrinking channels would change every static
shape downstream, so the equivalent production transform is *channel
masking*: the lowest-L1 output channels of each prunable conv are zeroed
in the kernel, bias, and the following BatchNorm scale/bias — the zeroed
activations then propagate exactly like physically removed channels
(XLA still executes dense convs; the win is model-size/sparsity, and the
mask is the input to any later channel-slimming recompile). A per-layer
report mirroring logs/layer_pruning.log is printed and saved.

Usage:
  python tools/prune.py --cfg cfg/rep_yolo.yaml --ckpt ... --amount 0.8
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import numpy as np


def prune_convbn_tree(params: dict, amount: float,
                      prefix: str = "") -> tuple[dict, list[dict]]:
    """Zero the `amount` fraction of output channels (by kernel L1 norm) of
    every ConvBnAct node ({'conv': {'w': ...}, 'bn': ...}) in the subtree.
    Returns (new_params, report rows)."""
    report = []

    def prune_pair(conv_node, bn_node, path):
        """Zero channels of one conv ({'w': {...}}) + its BN ({'norm': ...})."""
        kernel = np.asarray(conv_node["w"]["kernel"])       # HWIO
        cout = kernel.shape[-1]
        n_prune = int(round(cout * amount))
        if n_prune == 0 or n_prune >= cout:
            return None
        l1 = np.abs(kernel).sum(axis=(0, 1, 2))
        mask = np.ones(cout, np.float32)
        mask[np.argsort(l1)[:n_prune]] = 0.0
        new_conv = json_copy(conv_node)
        new_conv["w"]["kernel"] = kernel * mask
        if "bias" in new_conv["w"]:
            new_conv["w"]["bias"] = np.asarray(new_conv["w"]["bias"]) * mask
        new_bn = json_copy(bn_node)
        new_bn["norm"]["scale"] = np.asarray(new_bn["norm"]["scale"]) * mask
        new_bn["norm"]["bias"] = np.asarray(new_bn["norm"]["bias"]) * mask
        report.append({
            "layer": path, "out_channels": int(cout), "pruned": int(n_prune),
            "params_zeroed": int(n_prune * np.prod(kernel.shape[:3])),
        })
        return new_conv, new_bn

    def walk(node, path):
        if not isinstance(node, dict):
            return node
        # ConvBnAct: {'conv': {'w': ...}, 'bn': {'norm': ...}}
        if "conv" in node and "bn" in node and isinstance(node["conv"], dict) \
                and "w" in node["conv"]:
            pr = prune_pair(node["conv"], node["bn"], path)
            if pr is None:
                return node
            new = dict(node)
            new["conv"], new["bn"] = pr
            return new
        # RepS/RepConv style flat siblings: '<stem>_conv' + '<stem>_bn'
        out = {}
        handled = set()
        for k in node:
            if k.endswith("_conv") and isinstance(node[k], dict) \
                    and "w" in node[k]:
                bn_key = k[:-5] + "_bn"
                if bn_key in node and isinstance(node[bn_key], dict) \
                        and "norm" in node[bn_key]:
                    pr = prune_pair(node[k], node[bn_key], f"{path}/{k}")
                    if pr is not None:
                        out[k], out[bn_key] = pr
                        handled.update((k, bn_key))
        for k, v in node.items():
            if k not in handled:
                out[k] = walk(v, f"{path}/{k}" if path else k)
        return out

    def json_copy(d):
        if isinstance(d, dict):
            return {k: json_copy(v) for k, v in d.items()}
        return d

    return walk(params, prefix), report


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="cfg/rep_yolo.yaml")
    p.add_argument("--ckpt", default=None,
                   help="checkpoint to prune (default: fresh init)")
    p.add_argument("--amount", type=float, default=0.8)
    p.add_argument("--backbone-only", action="store_true", default=True,
                   help="prune backbone layers only (reference "
                        "tools/prunmodel.py:60-71 ignores head modules)")
    p.add_argument("--out", default="pruned")
    p.add_argument("--log", default="logs/layer_pruning.log")
    args = p.parse_args(argv)

    from rep_yolo_tpu.models.model import RepYOLO
    from rep_yolo_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    model = RepYOLO.from_config(args.cfg)
    variables = model.init(jax.random.PRNGKey(0), img_size=256)
    if args.ckpt:
        variables = load_checkpoint(args.ckpt, variables)

    params = dict(variables["params"])
    # backbone = layers before the SPPCSPC head start (cfg rows 0..8 for
    # the flagship graph; generically: layers strictly before the first
    # layer whose inputs skip backward by more than 1)
    backbone_keys = []
    for spec in model.cfg.layers:
        if len(spec.f) > 1:
            break
        backbone_keys.append(f"l{spec.i}")

    report_all = []
    for key in backbone_keys:
        if key not in params:
            continue
        pruned, rep = prune_convbn_tree(params[key], args.amount, key)
        params[key] = pruned
        report_all.extend(rep)

    variables = dict(variables)
    variables["params"] = params
    save_checkpoint(args.out, variables, meta={
        "cfg": args.cfg, "amount": args.amount, "layers": len(report_all)})

    log_path = Path(args.log)
    log_path.parent.mkdir(parents=True, exist_ok=True)
    lines = [f"{r['layer']}: pruned {r['pruned']}/{r['out_channels']} "
             f"channels ({r['params_zeroed']} params zeroed)"
             for r in report_all]
    total = sum(r["params_zeroed"] for r in report_all)
    lines.append(f"TOTAL: {total} params zeroed across "
                 f"{len(report_all)} convs at amount={args.amount}")
    log_path.write_text("\n".join(lines) + "\n")
    print("\n".join(lines[-5:]))


if __name__ == "__main__":
    main()

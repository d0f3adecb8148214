"""Reparameterization as a pure pytree transform: train params -> deploy params.

Implements, over flax variable trees (params + batch_stats), exactly the
fusion algebra of the reference:

- Conv+BN fold (reference utils/torch_utils.py:181-201, Model.fuse at
  models/yolo.py:696-699)
- RepConv 3x3 || 1x1 || BN-identity collapse (reference
  models/common.py:522-565 `get_equivalent_kernel_bias`)
- RepS_Block multi-branch collapse (reference models/common.py:3462-3517
  `_get_kernel_bias`/`_fuse_bn_tensor`)
- IDetect/IAuxDetect implicit-knowledge fold: bias += W @ ia; W,b *= im
  (reference models/yolo.py:170-182)

Everything is done in fp32 (cast up if needed) and works on HWIO kernels.
The result loads into the `deploy=True` variant of the same network; the
property |f_train(x; eval) - f_deploy(x)| < eps is asserted in
tests/test_reparam.py.

Unfused BatchNorms (the attention blocks' post-projection BNs, which the
reference also leaves unfused) keep their entries in the returned
batch_stats tree.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np


def _bn_terms(scale, bias, mean, var, eps: float = 1e-3):
    """Return (t, beta_hat): kernel multiplier per out-channel and bias."""
    std = jnp.sqrt(var + eps)
    t = scale / std
    return t, bias - mean * t


def fold_conv_bn(kernel, bn_params, bn_stats, eps: float = 1e-3):
    """HWIO kernel + BN -> (kernel', bias')."""
    t, beta = _bn_terms(bn_params["scale"], bn_params["bias"],
                        bn_stats["mean"], bn_stats["var"], eps)
    return kernel * t, beta  # t broadcasts over the last (out-channel) axis


def _identity_kernel(k: int, cin: int, cout: int, groups: int = 1):
    """HWIO identity kernel: delta at the spatial center
    (reference models/common.py:3502-3508 builds the OIHW equivalent).
    """
    w = np.zeros((k, k, cin // groups, cout), dtype=np.float32)
    c = k // 2
    for i in range(cout):
        w[c, c, i % (cin // groups), i] = 1.0
    return jnp.asarray(w)


def _pad_kernel_to(kernel, k: int):
    """Zero-pad a 1x1 HWIO kernel to k x k at the center."""
    p = k // 2
    return jnp.pad(kernel, ((p, p), (p, p), (0, 0), (0, 0)))


def fuse_conv_bn_node(p: dict, s: dict) -> dict:
    """ConvBnAct train node -> deploy node {'conv': {'w': kernel+bias}}."""
    kernel = p["conv"]["w"]["kernel"]
    k2, b2 = fold_conv_bn(kernel, p["bn"]["norm"], s["bn"]["norm"])
    return {"conv": {"w": {"kernel": k2, "bias": b2}}}


def fuse_repconv_node(p: dict, s: dict) -> dict:
    """RepConv train node -> {'rbr_reparam': {'w': {...}}}."""
    k3, b3 = fold_conv_bn(p["rbr_dense_conv"]["w"]["kernel"],
                          p["rbr_dense_bn"]["norm"], s["rbr_dense_bn"]["norm"])
    k1, b1 = fold_conv_bn(p["rbr_1x1_conv"]["w"]["kernel"],
                          p["rbr_1x1_bn"]["norm"], s["rbr_1x1_bn"]["norm"])
    kernel = k3 + _pad_kernel_to(k1, 3)
    bias = b3 + b1
    if "rbr_identity" in p:
        _, _, cin, cout = k3.shape
        kid, bid = fold_conv_bn(_identity_kernel(3, cin, cout),
                                p["rbr_identity"]["norm"],
                                s["rbr_identity"]["norm"])
        kernel = kernel + kid
        bias = bias + bid
    return {"rbr_reparam": {"w": {"kernel": kernel, "bias": bias}}}


def fuse_reps_node(p: dict, s: dict) -> dict:
    """RepS_Block train node -> {'reparam_conv': {'w': {...}}}."""
    # conv branches
    kernel = None
    bias = None
    i = 0
    while f"rbr_conv_{i}_conv" in p:
        ki, bi = fold_conv_bn(p[f"rbr_conv_{i}_conv"]["w"]["kernel"],
                              p[f"rbr_conv_{i}_bn"]["norm"],
                              s[f"rbr_conv_{i}_bn"]["norm"])
        kernel = ki if kernel is None else kernel + ki
        bias = bi if bias is None else bias + bi
        i += 1
    k = kernel.shape[0]
    if "rbr_scale_conv" in p:
        ks, bs_ = fold_conv_bn(p["rbr_scale_conv"]["w"]["kernel"],
                               p["rbr_scale_bn"]["norm"],
                               s["rbr_scale_bn"]["norm"])
        kernel = kernel + _pad_kernel_to(ks, k)
        bias = bias + bs_
    if "rbr_skip" in p:
        _, _, cin, cout = kernel.shape
        kid, bid = fold_conv_bn(_identity_kernel(k, cin, cout),
                                p["rbr_skip"]["norm"], s["rbr_skip"]["norm"])
        kernel = kernel + kid
        bias = bias + bid
    return {"reparam_conv": {"w": {"kernel": kernel, "bias": bias}}}


def fuse_idetect_node(p: dict, recurse=None) -> dict:
    """IDetect/IAuxDetect/IBin/IKeypoint node: fold ia/im into the lead
    head convs, drop aux convs (m2_*) — deploy inference uses lead heads
    only (reference models/yolo.py:170-182; aux heads dropped at export
    parity with IAuxDetect.fuse). Other subtrees (IKeypoint's m_kpt_*
    convs / refinement stacks) pass through `recurse` so their own
    Conv+BN pairs still fuse.
    """
    out: dict[str, Any] = {}
    i = 0
    while f"m_{i}" in p:
        kernel = p[f"m_{i}"]["kernel"]      # (1,1,cin,cout)
        bias = p[f"m_{i}"]["bias"]          # (cout,)
        if f"ia_{i}" in p:
            ia = p[f"ia_{i}"][0, 0, 0]      # (cin,)
            bias = bias + jnp.einsum("ij,i->j", kernel[0, 0], ia)
        if f"im_{i}" in p:
            im = p[f"im_{i}"][0, 0, 0]      # (cout,)
            bias = bias * im
            kernel = kernel * im
        out[f"m_{i}"] = {"kernel": kernel, "bias": bias}
        i += 1
    for key, val in p.items():
        if key in out or key.startswith(("ia_", "im_", "m2_")):
            continue
        out[key] = recurse(val, key) if (recurse and isinstance(val, dict)) \
            else val
    return out


def _is_leaf_dict(d: dict) -> bool:
    return all(not isinstance(v, dict) for v in d.values())


def fuse_variables(variables: dict) -> dict:
    """Full-tree fusion: {'params', 'batch_stats'} (train) ->
    {'params', 'batch_stats'} (deploy). Dispatch is structural, by the
    stable param names the block library emits.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p: dict, s: dict):
        if "rbr_dense_conv" in p:
            return fuse_repconv_node(p, s), None
        if "rbr_conv_0_conv" in p:
            return fuse_reps_node(p, s), None
        if "rbr_dense" in p and "w_origin" in p.get("rbr_dense", {}):
            from rep_yolo_tpu.nn.orepa import fuse_orepa_repconv_node

            return fuse_orepa_repconv_node(p, s), None
        if "w_origin" in p:
            from rep_yolo_tpu.nn.orepa import fuse_orepa_standalone_node

            return fuse_orepa_standalone_node(p, s), None
        if any(k.startswith("ia_") for k in p) or (
                "m_0" in p and _is_leaf_dict(p["m_0"]) and "kernel" in p["m_0"]):
            def recurse(sub, key):
                sub_s = s.get(key, {}) if isinstance(s, dict) else {}
                fp, _ = walk(sub, sub_s)
                return fp

            return fuse_idetect_node(p, recurse), None
        if "conv" in p and "bn" in p and isinstance(p["conv"], dict) \
                and "w" in p["conv"]:
            return fuse_conv_bn_node(p, s), None
        new_p, new_s = {}, {}
        for key, val in p.items():
            if isinstance(val, dict):
                sub_s = s.get(key, {}) if isinstance(s, dict) else {}
                fp, fs = walk(val, sub_s)
                new_p[key] = fp
                if fs:
                    new_s[key] = fs
            else:
                new_p[key] = val
        # keep batch_stats for BNs that have no param-side fusion pattern
        if isinstance(s, dict):
            for key, val in s.items():
                if key not in new_s and key in new_p and isinstance(val, dict):
                    # the param subtree survived unfused (e.g. post_bn)
                    if key in p and isinstance(p[key], dict) and \
                            _contains_bn(new_p[key]):
                        new_s[key] = val
        return new_p, (new_s or None)

    def _contains_bn(p: dict) -> bool:
        if "scale" in p and "bias" in p and _is_leaf_dict(p):
            return True
        return any(isinstance(v, dict) and _contains_bn(v) for v in p.values())

    new_params, new_stats = walk(params, stats)
    out = {"params": new_params}
    out["batch_stats"] = new_stats or {}
    return out

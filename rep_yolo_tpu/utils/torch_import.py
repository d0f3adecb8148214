"""Import reference (PyTorch Rep-YOLO) weights into rep_yolo_tpu variables.

Maps a torch ``state_dict`` (as a {key: np.ndarray} dict — e.g. loaded from
an exported .npz, no torch dependency here) onto our flax variable tree.
The block library uses param names chosen to make this a mechanical string
rewrite; kernels are transposed OIHW -> HWIO.

This gives (a) golden-parity tests against reference activations and
(b) a migration path for users with reference-trained checkpoints.
"""

from __future__ import annotations

import re
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np


def _map_components(parts: list[str]) -> list[str]:
    """Rewrite one flax path (component list) into torch key components."""
    out: list[str] = []
    for comp in parts:
        if re.fullmatch(r"l\d+", comp):
            out += ["model", comp[1:]]
        elif re.fullmatch(r"stage\d", comp):
            out += [comp, "0"]  # stages are Sequential([RepS, Dropout])
        elif (m := re.fullmatch(r"rbr_conv_(\d+)_(conv|bn)", comp)):
            out += ["rbr_conv", m.group(1), m.group(2)]
        elif (m := re.fullmatch(r"rbr_scale_(conv|bn)", comp)):
            out += ["rbr_scale", m.group(1)]
        elif comp == "rbr_dense_conv":
            out += ["rbr_dense", "0"]
        elif comp == "rbr_dense_bn":
            out += ["rbr_dense", "1"]
        elif comp == "rbr_1x1_conv":
            out += ["rbr_1x1", "0"]
        elif comp == "rbr_1x1_bn":
            out += ["rbr_1x1", "1"]
        elif (m := re.fullmatch(r"gsb_(\d+)", comp)):
            out += ["gsb", m.group(1)]
        elif comp == "gs1":
            out += ["conv_lighting", "0"]
        elif comp == "gs2":
            out += ["conv_lighting", "1"]
        elif (m := re.fullmatch(r"(m2?|ia|im)_(\d+)", comp)):
            out += [m.group(1), m.group(2)]
        elif (m := re.fullmatch(r"m1_(\d+)", comp)):
            out += ["m1", m.group(1)]
        elif comp == "w":      # ConvUnit's inner nn.Conv
            pass
        elif comp == "norm":   # BN's inner nn.BatchNorm
            pass
        else:
            out.append(comp)
    return out


def _torch_key(collection: str, path: list[str], leaf: str) -> str:
    comps = _map_components(path)
    if leaf == "kernel":
        comps.append("weight")
    elif leaf == "scale":
        comps.append("weight")
    elif leaf == "mean":
        comps.append("running_mean")
    elif leaf == "var":
        comps.append("running_var")
    elif leaf == "bias":
        comps.append("bias")
    elif leaf in ("gamma", "w"):
        comps.append(leaf)
    elif leaf.startswith("ia_") or leaf.startswith("im_"):
        comps += [leaf[:2], leaf[3:], "implicit"]
    else:
        comps.append(leaf)
    return ".".join(comps)


def export_torch_state(variables: dict) -> dict[str, np.ndarray]:
    """Inverse of import_torch_state: our variables tree -> a torch-style
    {state_dict key: np.ndarray} mapping (kernels HWIO -> OIHW). Lets a
    model trained here be loaded into the reference's torch Model for
    cross-framework A/B evaluation."""
    out: dict[str, np.ndarray] = {}

    def convert(collection: str):
        def leaf_fn(path, val):
            parts = [p.key for p in path]
            leaf = parts[-1]
            key = _torch_key(collection, parts[:-1], leaf)
            src = np.asarray(val, np.float32)
            if leaf == "kernel" and src.ndim == 4:
                src = src.transpose(3, 2, 0, 1)  # HWIO -> OIHW
            if leaf.startswith(("ia_", "im_")) and src.ndim == 4:
                src = src.transpose(0, 3, 1, 2)  # (1,1,1,C) -> (1,C,1,1)
            out[key] = src
            return val

        jax.tree_util.tree_map_with_path(leaf_fn,
                                         variables.get(collection, {}))

    convert("params")
    convert("batch_stats")
    return out


def import_torch_state(variables: dict,
                       state: Mapping[str, np.ndarray],
                       strict: bool = True) -> dict:
    """Return a new variables tree with values taken from `state`."""
    missing: list[str] = []

    def convert(collection: str):
        def leaf_fn(path, val):
            parts = [p.key for p in path]
            leaf = parts[-1]
            key = _torch_key(collection, parts[:-1], leaf)
            if key not in state:
                missing.append(key)
                return val
            src = np.asarray(state[key])
            if leaf == "kernel" and src.ndim == 4:
                src = src.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            if leaf.startswith(("ia_", "im_")) and src.ndim == 4:
                src = src.transpose(0, 2, 3, 1)  # (1,C,1,1) -> (1,1,1,C)
            if src.shape != val.shape:
                src = src.reshape(val.shape)
            return jnp.asarray(src, val.dtype)

        return jax.tree_util.tree_map_with_path(
            leaf_fn, variables.get(collection, {}))

    out = {"params": convert("params")}
    if "batch_stats" in variables:
        out["batch_stats"] = convert("batch_stats")
    if missing and strict:
        raise KeyError(f"{len(missing)} torch keys not found, e.g. {missing[:8]}")
    return out

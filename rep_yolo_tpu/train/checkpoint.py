"""Checkpoint / resume: orbax pytree checkpoints.

Replaces the reference's pickled-whole-nn.Module checkpoints (reference
train.py:463-488 — which require the code tree to unpickle) with pure
pytree state: params, batch_stats, EMA, optimizer state, step/epoch, RNG.
Cadence mirrors the reference: last every epoch, best on fitness
improvement (reference train.py:472-483). `strip_optimizer` becomes a
pure transform selecting the EMA weights (reference utils/general.py:1145).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def save_checkpoint(path: str | Path, state, meta: dict | None = None):
    """Save a TrainState (or any pytree) + metadata. Uses orbax when
    available, .npz otherwise (both pure-data formats)."""
    # resolve(): orbax's tensorstore writer requires absolute paths (it
    # raises from a background thread on relative ones, after which the
    # synchronous save returns "successfully" having written nothing)
    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        # multi-process runs save rank-0-only (reference train.py:419
        # gating); orbax's writer would block on global sync barriers the
        # other processes never enter, so use the local .npz format there
        # (the state is fully replicated — plain host arrays)
        if jax.process_count() > 1:
            raise RuntimeError("multiprocess: local npz checkpoint")
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(str(path.with_suffix("")) + ".orbax",
                   jax.tree.map(np.asarray, state), force=True)
    except Exception:
        np.savez(str(path.with_suffix(".npz")), **_flatten(state))
    if meta is not None:
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2))


def load_checkpoint(path: str | Path, target):
    """Load into the structure of `target` (a template pytree)."""
    path = Path(path).resolve()
    orbax_dir = Path(str(path.with_suffix("")) + ".orbax")
    if orbax_dir.exists():
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(str(orbax_dir), item=target)
        return restored
    npz = np.load(str(path.with_suffix(".npz")))
    flat_target = _flatten(target)
    leaves, treedef = jax.tree_util.tree_flatten(target)
    keys = list(_flatten(target).keys())
    assert len(keys) == len(leaves)
    new_leaves = [npz[k] for k in keys]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def latest_run(root: str | Path = "runs/train") -> Path | None:
    """Most recent last checkpoint (reference get_latest_run,
    utils/general.py:46-49)."""
    root = Path(root)
    cands = sorted(root.glob("**/last.json"), key=os.path.getmtime) \
        if root.exists() else []
    return cands[-1].with_suffix("") if cands else None


def strip_to_deploy(state_or_variables, half: bool = True) -> dict:
    """The strip_optimizer analog (reference utils/general.py:1145-1158):
    swap EMA->model, drop the optimizer/RNG/counters, and optionally
    halve precision (torch `.half()` -> bf16 here). Accepts a TrainState
    (uses its EMA shadow) or a bare variables dict. Fusion to deploy
    weights is a separate pure step (model.fuse).
    """
    v = getattr(getattr(state_or_variables, "ema", None), "variables", None)
    if v is None:
        v = state_or_variables
    v = {"params": v["params"], "batch_stats": v.get("batch_stats", {})}
    if half:
        v = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and a.dtype == np.float32 else a, v)
    return v

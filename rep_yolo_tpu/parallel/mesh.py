"""Device mesh + sharding policy.

The TPU-native replacement for the reference's NCCL/DDP stack
(reference train.py:249-292,610-612; utils/datasets.py:82): a single
program jit-sharded over a `jax.sharding.Mesh`. The batch is sharded on
the `data` axis; params/optimizer state are replicated. Gradient
all-reduce, global-batch BN statistics, and replicated metrics all fall
out of XLA's partitioner (collectives ride ICI) — no rank gating, no
explicit psum in user code.

For multi-host/multi-slice, extend the mesh with a leading `dcn` axis and
shard the batch over ('dcn', 'data'); per-host input feeding via
jax.make_array_from_process_local_data.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Sequence | None = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Device-put a host pytree with batch-axis sharding."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

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


def replicate_host_tree(tree, mesh: Mesh):
    """Host pytree -> fully-replicated global arrays, collective-free.

    In multi-process runs, `jax.device_put(host_data, global_sharding)`
    first runs multihost_utils.assert_equal — a cross-process allgather
    whose gloo rendezvous times out at ~30 s, which model-init/compile
    skew between processes easily exceeds on slow hosts. Every process
    is REQUIRED to pass identical data (same seed or same checkpoint —
    the invariant DDP broadcast establishes, reference train.py:610);
    this builds the replicated arrays directly from local device buffers
    with no cross-process communication.
    """
    repl = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(tree, repl)

    def put(x):
        x = np.asarray(x)
        bufs = [jax.device_put(x, d) for d in mesh.local_devices]
        return jax.make_array_from_single_device_arrays(x.shape, repl, bufs)

    return jax.tree.map(put, tree)


def barrier(name: str, timeout_ms: int = 3_600_000) -> None:
    """Cross-process barrier via the jax.distributed coordination service.

    Unlike gloo/ICI collectives (whose rendezvous window is ~30 s), this
    tolerates long skew — use it to re-align processes around
    rank-0-only host work (eval, checkpoints), so no process sits inside
    a step collective while rank 0 is busy (the torch.distributed
    barrier analog, reference utils/torch_utils.py:27-36).
    """
    if jax.process_count() <= 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_in_ms=timeout_ms)

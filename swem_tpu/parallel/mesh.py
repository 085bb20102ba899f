"""Device mesh and sharding helpers.

The reference's only multi-device strategy is data parallelism over NCCL DDP
(/root/reference/train.py:28-41, swem_trainer.py:42-43, SURVEY.md §2.5). The
TPU-native expression: a 1-D (or 2-D future-proofed) ``jax.sharding.Mesh``
with the global batch sharded over the 'data' axis and parameters
replicated; ``jit`` then compiles the gradient all-reduce onto ICI — no
user-level collective code.

Multi-host: call ``jax.distributed.initialize()`` before building the mesh
(the jax.distributed runtime replaces the reference's env:// NCCL
rendezvous, train.py:24-38).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the available (or given) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with its leading axis sharded.

    Single-host: a plain device_put. Multi-host: each process holds only its
    per-host slice (the loader shards by process), so the global array is
    assembled from process-local data.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)

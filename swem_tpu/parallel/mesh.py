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


def clamp_pow2(limit: int, *divisors: int) -> int:
    """Largest power of two ≤ ``limit`` that divides every ``divisors``."""
    k = 1
    while k * 2 <= limit:
        k *= 2
    while k > 1 and any(d % k for d in divisors):
        k //= 2
    return k


def eval_devices() -> list:
    """Devices THIS process may build evaluation meshes over.

    Distributed evaluation shards the *video list* across processes
    (disjoint work, no lockstep SPMD between hosts), so each process's
    meshes must contain only its own addressable devices —
    device_put onto another host's device is an error in
    multi-controller JAX. Single-process: the global list.
    """
    return list(jax.local_devices() if jax.process_count() > 1
                else jax.devices())


def derive_eval_mesh_extents(ndev: int, obj_parallel: int, vb: int
                             ) -> tuple:
    """(n_data, n_obj) extents for batched-eval sharding.

    'obj' takes the largest power-of-two ≤ the requested ``obj_parallel``
    that divides the device count; 'data' then takes the largest extent
    ≤ the remaining devices that divides the video batch ``vb`` (sharding
    over fewer chips — some idle — beats not sharding at all when the
    batch doesn't split evenly). (1, 1) means run unsharded.
    """
    n_obj = 1
    if obj_parallel > 1 and ndev > 1:
        n_obj = clamp_pow2(min(obj_parallel, ndev), ndev)
    limit = ndev // n_obj
    n_data = max(d for d in range(1, limit + 1) if vb % d == 0)
    return n_data, n_obj


def make_mesh2(n_data: Optional[int] = None, n_obj: int = 1,
               devices=None) -> Mesh:
    """2-D ('data', 'obj') mesh: batch over 'data', object slots over 'obj'.

    The reference has no parallelism beyond DDP (SURVEY.md §2.5); the 'obj'
    axis is a TPU-native extension exploiting that everything between the
    EM memory banks and the soft-aggregation — the value-encoder, fusion,
    and decoder towers, i.e. the measured ~94%-MXU per-object conv FLOPs —
    is embarrassingly parallel over the padded object axis (see
    ``EngineSharding``). ``n_obj`` must divide the model's ``max_objs``.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_obj:
            raise ValueError(
                f"{len(devices)} devices not divisible by n_obj={n_obj}")
        n_data = len(devices) // n_obj
    devices = devices[: n_data * n_obj]
    if len(devices) < n_data * n_obj:
        raise ValueError(
            f"need {n_data * n_obj} devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(n_data, n_obj), ("data", "obj"))


class EngineSharding:
    """Sharding-constraint hooks for object-parallel model execution.

    Strategy (GSPMD, not shard_map): constrain the three (B, N, ...)
    hand-off points of a frame step — the ``VOSMemory`` banks, the value
    features ``mv16``, and the match ``context`` — to a ('data', 'obj')
    mesh. XLA then partitions every op between the constraints along the
    object axis (the value-encoder / fusion / decoder conv towers, whose
    per-object ResBlocks are the profiled hot spots) and inserts exactly
    one all-gather per frame where objects genuinely interact: the
    soft-aggregation product over N (swem.py:110-116) and the
    "other-objects" mask sum (swem.py:50-57), both tiny next to the tower
    FLOPs. The EM memorize/read math itself never mixes objects, so the
    memory carry stays device-resident shard-local across the whole video.

    Works under both jit-of-scan (inference engine) and jit-of-grad
    (training unroll; ``with_sharding_constraint`` transposes to itself).
    """

    def __init__(self, mesh: Mesh):
        if "obj" not in mesh.axis_names:
            raise ValueError(f"mesh {mesh.axis_names} has no 'obj' axis")
        data = "data" if "data" in mesh.axis_names else None
        self.mesh = mesh
        self.n_obj = mesh.shape["obj"]
        self._bn = NamedSharding(mesh, P(data, "obj"))
        self._b = NamedSharding(mesh, P(data))
        self._rep = NamedSharding(mesh, P())

    def bn(self, x):
        """Constrain a (B, N, ...) array: batch over 'data', objects over 'obj'."""
        return jax.lax.with_sharding_constraint(x, self._bn)

    def b(self, x):
        """Constrain a (B, ...) array over 'data' only."""
        return jax.lax.with_sharding_constraint(x, self._b)

    def mem(self, mem):
        """Constrain a VOSMemory pytree: bank leaves (B, N, 2, C, L) shard
        like (B, N, ...); the scalar mem_count is replicated."""
        def c(t):
            sh = self._bn if t.ndim >= 2 else self._rep
            return jax.lax.with_sharding_constraint(t, sh)
        return jax.tree.map(c, mem)


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

from swem_tpu.parallel.mesh import (
    EngineSharding,
    batch_sharding,
    clamp_pow2,
    derive_eval_mesh_extents,
    eval_devices,
    make_mesh,
    make_mesh2,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "EngineSharding",
    "batch_sharding",
    "clamp_pow2",
    "derive_eval_mesh_extents",
    "eval_devices",
    "make_mesh",
    "make_mesh2",
    "replicate",
    "replicated",
    "shard_batch",
]

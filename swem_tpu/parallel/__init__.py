from swem_tpu.parallel.mesh import (
    EngineSharding,
    batch_sharding,
    derive_eval_mesh_extents,
    make_mesh,
    make_mesh2,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "EngineSharding",
    "batch_sharding",
    "derive_eval_mesh_extents",
    "make_mesh",
    "make_mesh2",
    "replicate",
    "replicated",
    "shard_batch",
]

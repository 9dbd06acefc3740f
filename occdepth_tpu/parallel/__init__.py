from occdepth_tpu.parallel.mesh import (
    batch_sharding,
    make_hybrid_mesh,
    make_mesh,
    replicate_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_hybrid_mesh",
    "batch_sharding",
    "replicate_sharding",
    "shard_batch",
]

"""Mesh / sharding / collectives: the distributed substrate."""

from .collectives import check_replica_consistency, pmean_grads, psum_moments
from .mesh import (
    DATA_AXIS,
    RAY_AXIS,
    data_sharded,
    init_distributed,
    make_mesh,
    process_info,
    ray_sharded,
    replicated,
)
from .sharding import (
    batch_spec,
    put_global_batch,
    put_replicated,
    put_sharded,
    ray_spec,
    sharded_jit,
)

__all__ = [
    "DATA_AXIS",
    "RAY_AXIS",
    "batch_spec",
    "check_replica_consistency",
    "data_sharded",
    "init_distributed",
    "make_mesh",
    "process_info",
    "pmean_grads",
    "psum_moments",
    "put_replicated",
    "put_sharded",
    "ray_sharded",
    "ray_spec",
    "replicated",
    "sharded_jit",
]

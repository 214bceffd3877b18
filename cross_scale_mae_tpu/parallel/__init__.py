"""SPMD parallelism: mesh construction, sharding rules, multi-host bootstrap."""

from cross_scale_mae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_train_state,
)
from cross_scale_mae_tpu.parallel.dist import initialize_distributed

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_shardings",
    "replicated",
    "shard_train_state",
    "initialize_distributed",
]

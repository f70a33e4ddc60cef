"""Device-mesh parallelism: sharding rules and mesh construction."""

from radnet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_param_shardings,
    shard_train_state,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "make_param_shardings",
    "shard_train_state",
]

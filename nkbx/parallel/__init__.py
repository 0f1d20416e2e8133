from nkbx.parallel.mesh import (
    make_mesh,
    mesh_from_cfg,
    batch_sharding,
    replicated_sharding,
    shard_batch,
    param_shardings,
    state_shardings,
)

__all__ = [
    "make_mesh",
    "mesh_from_cfg",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "param_shardings",
    "state_shardings",
]

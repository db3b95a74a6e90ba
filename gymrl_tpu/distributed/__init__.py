from gymrl_tpu.distributed.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_pytree_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_pytree_batch"]

"""SPMD parallelism: device mesh construction and sharding rules."""

from ode_vio_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicated,
    shard_batch,
)

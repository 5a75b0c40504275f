"""Parallelism: device mesh, shardings, distributed init (the comm backend)."""

from learnablepoolingmethods_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    distributed_init,
    replicated_sharding,
    shard_batch,
)

"""SPMD: device mesh, sharding rules, data-parallel step wrappers."""

from mmde_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated_sharding, shard_batch)

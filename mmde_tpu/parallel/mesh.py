"""Device mesh + sharding rules.

The reference's only parallelism is single-process torch DataParallel
(train.py:93-97): replicate the model per GPU and scatter the batch. The
TPU-native equivalent is SPMD under a jax.sharding.Mesh: parameters
replicated, batch sharded over the 'data' axis, gradient reduction inserted
by XLA as psum over ICI. Multi-host extends the same mesh over DCN via
jax.distributed.initialize (see mmde_tpu.parallel.distributed).
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, axis_name: str = DATA_AXIS,
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices
    (0 = all)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host batch (pytree of arrays) with the leading dim
    sharded over the mesh. Scalars / 0-d leaves are replicated."""
    data_sh = batch_sharding(mesh, axis_name)
    rep_sh = replicated_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, data_sh)
        return jax.device_put(x, rep_sh)

    return jax.tree.map(put, batch)

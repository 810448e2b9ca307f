"""Multi-host initialization + cross-process utilities.

The reference has no real multi-process story (torch.distributed is imported
but never initialized — SURVEY.md §2.4/§5.8). For the TPU rebuild this is a
first-class component: multi-host SPMD over DCN with per-host data loading.

Usage on each host:
    from mmde_tpu.parallel import distributed as dist
    dist.initialize()                       # no-op on single host
    mesh = make_mesh()                      # global devices
    shard = dist.host_shard(len(dataset))   # this host's sample range
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; silently a no-op when single
    process (auto-detection covers TPU pods via the metadata server)."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError):
        # already initialized or single-process environment
        pass


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def host_shard(n: int) -> Tuple[int, int]:
    """[start, stop) of this host's contiguous shard of an n-sample dataset
    (per-host sharded input loading for the data-parallel mesh)."""
    p, i = jax.process_count(), jax.process_index()
    per = -(-n // p)
    return i * per, min(n, (i + 1) * per)


def all_mean_scalar(x: float) -> float:
    """Mean of a host scalar across processes (eval metric reduction)."""
    if jax.process_count() == 1:
        return float(x)
    from jax.experimental import multihost_utils
    arr = multihost_utils.process_allgather(np.asarray(x, np.float64))
    return float(np.mean(arr))

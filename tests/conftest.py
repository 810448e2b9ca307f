"""Test configuration: force an 8-device virtual CPU platform so the
SPMD/data-parallel paths are exercised without TPU hardware.

Note: the container's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (remote TPU tunnel). Backends initialize lazily, so
overriding via jax.config here — before any backend is touched — still works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # 8 virtual devices time-share the host cores; on small boxes the
    # default 20s/40s CPU-collective rendezvous abort can fire while other
    # device threads are still queued behind compiles/tests.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=300"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavyweight jitted steps (mesh train step,
# swin stacks) cost minutes each to compile on small hosts; cached
# executables make suite re-runs start in seconds. Keyed per machine —
# XLA:CPU AOT entries are ISA-specific and cross-machine loads only produce
# "machine features mismatch" spam (mmde_tpu/utils/cache.py).
from mmde_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"), min_compile_secs=10.0)

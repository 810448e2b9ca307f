"""Test configuration: force an 8-device virtual CPU platform so the
SPMD/data-parallel paths are exercised without TPU hardware.

Note: the container's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (remote TPU tunnel). Backends initialize lazily, so
overriding via jax.config here — before any backend is touched — still works.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

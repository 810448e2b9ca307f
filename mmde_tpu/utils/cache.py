"""Persistent-compile-cache location, keyed per machine.

XLA:CPU AOT cache entries embed the compile machine's CPU feature set; when
a cache written on one host is read on another, every load fails with
"machine features mismatch ... could lead to SIGILL" stderr spam and the
full compile runs anyway — pure cost. Keying the cache directory on a
fingerprint of the local CPU (plus the jax version, which also invalidates
entries) makes cross-machine reuse structurally impossible while keeping
same-machine reuse.
"""
from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable id for this machine's ISA feature set."""
    bits = [platform.machine(), platform.system()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    try:
        import jax
        bits.append(jax.__version__)
    except Exception:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def cache_dir(base: str) -> str:
    """Per-machine subdirectory of `base` (created if missing)."""
    d = os.path.join(base, machine_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def enable_persistent_cache(base: str, min_compile_secs: float = 5.0) -> None:
    """Point jax's persistent compilation cache at the per-machine dir."""
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir(base))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass

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
    """Short stable id for this machine's ISA feature set.

    Includes model/stepping/microcode, not just the flags line: LLVM
    derives tuning features like +prefer-no-gather from the microcode
    revision (Downfall mitigation), so two hosts with identical cpuinfo
    flags can still produce mutually unloadable XLA:CPU AOT entries."""
    bits = [platform.machine(), platform.system()]
    try:
        want = ("flags", "Features", "model name", "model\t", "stepping",
                "microcode")
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if line.startswith(want) and key not in seen:
                    seen.add(key)
                    bits.append(line.strip())
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


def prune_cache(base: str, max_bytes: int = 1536 * 1024 * 1024,
                max_age_days: float = 14.0) -> None:
    """Bound the persistent cache: drop stale layouts, then enforce a cap.

    Removes (a) loose entries at the base root (pre-round-3 layout — they
    are keyed neither per machine nor per platform and can never be safely
    loaded), (b) whole platform/fingerprint SUBDIRS whose *newest* entry is
    older than `max_age_days` (stale fingerprints / jax versions accumulate
    one dir per driver host otherwise), then (c) oldest-mtime entries until
    total size <= max_bytes. Age is keyed per subdir, not per file: JAX
    cache *hits* never bump mtime, so a per-file cutoff would evict the
    entries of a stable, daily-read model and silently recompile it — a dir
    is stale only when nothing in it has been (re)compiled for the window.
    Never touches anything outside `base`; all errors are
    best-effort-ignored so cache hygiene can't break a run.
    """
    import time
    now = time.time()
    entries = []          # (mtime, size, path, topdir)
    newest_in_dir = {}    # top-level subdir -> newest entry mtime
    try:
        for root, _dirs, files in os.walk(base):
            for fn in files:
                p = os.path.join(root, fn)
                try:
                    st = os.stat(p)
                except OSError:
                    continue
                if root == base:                    # pre-round-3 loose entry
                    _unlink(p)
                    continue
                rel = os.path.relpath(root, base)
                top = rel.split(os.sep)[0]
                newest_in_dir[top] = max(newest_in_dir.get(top, 0.0),
                                         st.st_mtime)
                entries.append((st.st_mtime, st.st_size, p, top))
    except OSError:
        return
    cutoff = now - max_age_days * 86400.0
    kept, total = [], 0
    for mtime, size, p, top in sorted(entries, reverse=True):
        if newest_in_dir.get(top, 0.0) < cutoff:   # whole subdir is stale
            _unlink(p)
        else:
            kept.append((mtime, size, p))
            total += size
    while kept and total > max_bytes:              # oldest first past the cap
        mtime, size, p = kept.pop()
        _unlink(p)
        total -= size
    # sweep now-empty subdirs (stale fingerprint/version dirs)
    try:
        for root, dirs, files in os.walk(base, topdown=False):
            if root != base and not dirs and not files:
                try:
                    os.rmdir(root)
                except OSError:
                    pass
    except OSError:
        pass


def _unlink(p: str) -> None:
    try:
        os.unlink(p)
    except OSError:
        pass


def enable_persistent_cache(base: str, min_compile_secs: float = 5.0) -> None:
    """Point jax's persistent compilation cache at the right subdir.

    Device-platform (TPU/axon) executables are host-independent — sharing
    them across machines lets a fresh host reuse this one's flagship
    train-step compile (~15 min through the remote tunnel). XLA:CPU AOT
    entries embed host CPU tuning features, so the cpu platform gets the
    per-machine dir. Initializes the backend to learn the platform; every
    caller selects its platform before calling this.
    """
    import jax
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    d = (cache_dir(base) if plat == "cpu"
         else os.path.join(base, f"{plat}-{jax.__version__}"))
    os.makedirs(d, exist_ok=True)
    prune_cache(base)
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass

"""Persistent-compile-cache location, fingerprinted by host CPU.

XLA:CPU AOT executables encode target machine features; /tmp persists
across build rounds whose hosts differ, and loading a cache entry compiled
for another machine risks SIGILL (observed: cpu_aot_loader "machine type
doesn't match" errors).  Keying the cache dir by the /proc/cpuinfo flags
set makes reuse safe: same machine -> same dir, different machine -> fresh
dir.  Deliberately imports nothing that could initialize a JAX backend.
"""
from __future__ import annotations

import hashlib
import platform


def _cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.md5(flags.encode()).hexdigest()[:10]
    except OSError:
        pass
    return hashlib.md5(platform.processor().encode()).hexdigest()[:10]


def cache_dir() -> str:
    return f"/tmp/jax_cache_tsue_{_cpu_fingerprint()}"


def configure(jax_module, min_secs: float = 1.0) -> None:
    """Point jax's persistent compile cache at the fingerprinted dir."""
    jax_module.config.update("jax_compilation_cache_dir", cache_dir())
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs",
                             min_secs)

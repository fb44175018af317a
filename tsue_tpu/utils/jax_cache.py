"""Persistent-compile-cache location, fingerprinted by host + toolchain.

XLA:CPU AOT executables encode target machine features; /tmp persists
across build rounds whose hosts differ, and loading a cache entry compiled
for another machine risks SIGILL (observed: cpu_aot_loader "machine type
doesn't match" errors).  /proc/cpuinfo flags alone proved insufficient —
XLA's LLVM target-feature string (e.g. ``+prefer-no-gather``) is chosen by
jaxlib's bundled LLVM from the *model* of CPU, not the flag set, so two
hosts with identical flags can still produce incompatible AOT entries
(seen as a tail of cpu_aot_loader mismatch errors in MULTICHIP_r03).  The
fingerprint therefore includes the cpuinfo flags, the exact CPU model
name, and the jax/jaxlib versions; any of them changing rotates to a
fresh dir.  Deliberately imports nothing that could initialize a JAX
backend (importlib.metadata reads the dist-info, not the package).

Known cosmetic limit (r4): XLA:CPU compiles with tuning pseudo-features
(``+prefer-no-gather``/``+prefer-no-scatter``) that the AOT loader's
host-feature probe never reports, so every CPU cache *hit* logs a
spurious ``cpu_aot_loader`` "machine type doesn't match ... SIGILL"
error — even loading an entry this very machine just wrote.  The load
still succeeds and the fingerprint still guards the real cross-machine
hazard; contexts where a clean log matters more than compile reuse
(the driver's multichip dryrun) simply skip ``configure`` on CPU.
"""
from __future__ import annotations

import hashlib
import platform


def _cpu_fingerprint() -> str:
    parts = []
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags") and not any(
                        p.startswith("flags=") for p in parts):
                    parts.append("flags=" + " ".join(
                        sorted(line.split(":", 1)[1].split())))
                elif line.startswith("model name") and not any(
                        p.startswith("model=") for p in parts):
                    parts.append(
                        "model=" + line.split(":", 1)[1].strip())
    except OSError:
        pass
    if not parts:
        parts.append("proc=" + platform.processor())
    # jax/jaxlib version: the AOT serialization format and the bundled
    # LLVM both change with jaxlib, so never share a dir across versions.
    try:
        from importlib.metadata import version
        parts.append(f"jax={version('jax')}+jaxlib={version('jaxlib')}")
    except Exception:  # pragma: no cover - metadata always present here
        pass
    parts.append("machine=" + platform.machine())
    return hashlib.md5("|".join(parts).encode()).hexdigest()[:10]


def cache_dir() -> str:
    return f"/tmp/jax_cache_tsue_{_cpu_fingerprint()}"


def configure(jax_module, min_secs: float = 1.0) -> None:
    """Point jax's persistent compile cache at the fingerprinted dir."""
    jax_module.config.update("jax_compilation_cache_dir", cache_dir())
    jax_module.config.update("jax_persistent_cache_min_compile_time_secs",
                             min_secs)

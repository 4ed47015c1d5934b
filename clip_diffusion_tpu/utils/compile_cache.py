"""Persistent XLA compile-cache configuration — the ONE implementation
shared by bench.py and __graft_entry__.py (they previously carried
divergent copies of this block).

TPU programs share a single `<root>/.jax_cache` (remote compiles are
~220 s cold, seconds warm).  CPU programs get their OWN
`<root>/.jax_cache_cpu_<fingerprint>` dir: a cached CPU executable is
host-specialized XLA:CPU AOT code, but jax's cache key does NOT include
host features, and this container migrates hosts — a stale shared entry
loads with a "machine type ... doesn't match" warning and can
SIGILL/hang one fake-mesh device thread, which then misses the 8-way
all-reduce rendezvous (40 s) and aborts a whole dryrun.  Fingerprinting
the dir by /proc/cpuinfo's flags line turns a host switch into one cold
recompile instead.
"""

from __future__ import annotations

import os


def cpu_cache_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags.  Raises when
    /proc/cpuinfo is unreadable — callers treat that as "no CPU cache"
    (a cold compile is always safe; a stale host-specialized one is not).
    """
    import hashlib

    with open("/proc/cpuinfo", "rb") as f:
        flags = [ln for ln in f if ln.startswith(b"flags")]
    return hashlib.sha256(flags[0] if flags else b"none").hexdigest()[:10]


def enable_compile_cache(root: str, cpu: bool = False) -> None:
    """Point jax's persistent compile cache at `<root>/.jax_cache`
    (TPU) or `<root>/.jax_cache_cpu_<fingerprint>` (CPU).  Best-effort:
    config-flag differences across jax versions, or an unreadable
    /proc/cpuinfo under cpu=True, leave the cache unconfigured."""
    import jax

    name = ".jax_cache"
    if cpu:
        try:
            name = f".jax_cache_cpu_{cpu_cache_fingerprint()}"
        except Exception:  # noqa: BLE001
            return
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, name))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

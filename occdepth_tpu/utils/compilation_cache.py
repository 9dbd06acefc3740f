"""Persistent XLA compilation cache (first compile ~minutes; later runs ms).

Enabled by all CLIs, bench.py, and __graft_entry__ so repeated invocations
skip recompilation.  Cache dir override: OCCDEPTH_TPU_CACHE.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OCCDEPTH_TPU_CACHE", "/tmp/occdepth_tpu_xla_cache"
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags

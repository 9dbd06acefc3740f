"""Persistent XLA compilation cache (first compile ~minutes; later runs ms).

Enabled by all CLIs, bench.py, and __graft_entry__ so repeated invocations
skip recompilation.  Cache dir override: OCCDEPTH_TPU_CACHE.

The cache directory is suffixed with a host fingerprint (nodename + machine
+ jaxlib version): XLA:CPU cache entries embed ahead-of-time compiled code
for the *compiling* host's exact CPU features, and loading an entry written
by a different machine warns "could lead to execution errors such as
SIGILL" (cpu_aot_loader.cc) — observed here with foreign-host entries in a
shared /tmp cache, a plausible contributor to the round-2 multichip-dryrun
hang.  Per-host dirs make stale foreign entries unreachable.
"""
from __future__ import annotations

import os
import platform


def _host_tag() -> str:
    try:
        import jaxlib

        v = getattr(jaxlib, "__version__", "x")
    except Exception:  # pragma: no cover
        v = "x"
    return f"{platform.node()}-{platform.machine()}-jl{v}"


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get("OCCDEPTH_TPU_CACHE")
    if cache_dir is None:
        cache_dir = f"/tmp/occdepth_tpu_xla_cache-{_host_tag()}"
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags

"""Opt-in persistent XLA compilation cache.

The fused Pallas kernels dominate cold-start time (a single fused-BabyAI
configuration can take ~2 min to compile); a persistent on-disk cache makes
repeat runs of the test suite, the profiler, and the bench near-instant to
warm up.  The cache lives outside the repo so ``git clean`` never
invalidates it.  Shared by tests/conftest.py, tools/profiler.py and
bench.py; no reference analogue (the reference has no compiled artifacts).
"""

from __future__ import annotations

import os


def enable_compile_cache() -> str | None:
    """Point JAX at the persistent compile cache; returns the directory, or
    None if the backend/config rejects it (e.g. an older jaxlib) — callers
    proceed uncached in that case."""
    import jax

    cache_dir = os.environ.get(
        "MINIGRID_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/minigrid_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir

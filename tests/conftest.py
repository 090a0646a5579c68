"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4: fake-device meshes are
the distributed test strategy).

``XLA_FLAGS`` is read when jaxlib loads — too early for a conftest on this
image (importing pytest already imports jax) — so the virtual device count
is set through jax.config, which applies at backend initialization.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin hook
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the default suite is compile-dominated (the
# top test durations are all first-compiles of the fused Pallas kernels), so
# a warm cache cuts repeat wall time by an order of magnitude.  The cache
# lives outside the repo so `git clean` never invalidates it.
_cache_dir = os.environ.get(
    "MINIGRID_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/minigrid_tpu_xla")
)
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

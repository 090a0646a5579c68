"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4: fake-device meshes are
the distributed test strategy).

``XLA_FLAGS`` is read when jaxlib loads — too early for a conftest on this
image (importing pytest already imports jax) — so the virtual device count
is set through jax.config, which applies at backend initialization.
"""

import os
import sys

# The opt-in perf lane (tests/test_perf_tpu.py) must see the REAL chip;
# forcing cpu here would silently skip every floor assertion (the lane ran
# 0 TPU tests before this guard).  Scope the override to invocations that
# actually target the perf lane file — RUN_TPU_PERF=1 on a full-suite run
# would otherwise route EVERY test (including the slow fused-kernel
# equivalence tests) to the real shared chip.  Run it alone:
#     RUN_TPU_PERF=1 python -m pytest tests/test_perf_tpu.py
_perf_lane = os.environ.get("RUN_TPU_PERF") and any(
    "test_perf_tpu" in a for a in sys.argv
)
if _perf_lane:
    import jax  # noqa: E402
else:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin hook
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the default suite is compile-dominated (the
# top test durations are all first-compiles of the fused Pallas kernels), so
# a warm cache cuts repeat wall time by an order of magnitude (shared with
# tools/profiler.py and bench.py via utils/compile_cache.py).
from minigrid_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (SURVEY.md §4: fake-device meshes are
the distributed test strategy)."""

import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin hook
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

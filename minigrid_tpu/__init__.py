"""minigrid_tpu — a TPU-native, batched re-implementation of the Minigrid
environment suite (reference capability target: jysdoran/Minigrid 2.3.1).

Episode state is a pytree of dense arrays; dynamics are pure jit/vmap/scan
functions; procedural generation runs on device from PRNG keys.
"""

from __future__ import annotations

__version__ = "0.1.0"

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import MissionSpace
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.registry import make, register, registered_ids

from minigrid_tpu import envs as _envs  # noqa: F401  (populates the registry)

__all__ = [
    "Actions",
    "EnvState",
    "MiniGridEnv",
    "MissionSpace",
    "make",
    "register",
    "registered_ids",
    "__version__",
]

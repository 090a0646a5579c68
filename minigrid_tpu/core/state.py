"""Environment state as a pytree of dense arrays.

The reference keeps a Python object graph (`Grid` of `WorldObj` instances,
reference: minigrid/core/grid.py:20-35); here the entire episode state is a
flat struct of arrays so thousands of environments batch under `vmap` and
step under `lax.scan` without leaving the device.

Layout conventions
------------------
* ``grid``: uint8[W, H, 3] — (type, color, state) planes indexed [x, y],
  matching the reference's ``Grid.encode`` output layout
  (reference: minigrid/core/grid.py:244-268).  Empty cells are stored as
  (OBJ_EMPTY, 0, 0); the OBJ_UNSEEN code never appears in a world grid.
* ``contains``: uint8[W, H, 2] — (type, color) of the object hidden inside a
  box at that cell, type 0 meaning "nothing".  This replaces the reference's
  ``Box.contains`` object pointer (reference: minigrid/core/world_object.py:274).
* ``carrying``: uint8[4] — (type, color, contains_type, contains_color) of the
  held object; type 0 means empty hands.
* ``agent_pos``: int32[2] (x, y); ``agent_dir``: int32 in [0, 4).
* ``mission``: int32[MISSION_DIM] — structured mission encoding; see
  minigrid_tpu/core/mission.py.
* ``extra``: optional env-family-specific pytree (e.g. obstacle positions for
  DynamicObstacles).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

# Fixed width of the structured mission vector carried in state/observations.
# mission[0] is a mission-template id; remaining slots are template params
# (color/type indices, coordinates).  Unused slots are zero.
MISSION_DIM = 8


@struct.dataclass
class EnvState:
    grid: jnp.ndarray  # uint8[W, H, 3]
    contains: jnp.ndarray  # uint8[W, H, 2]
    agent_pos: jnp.ndarray  # int32[2]
    agent_dir: jnp.ndarray  # int32[]
    carrying: jnp.ndarray  # uint8[4]
    step_count: jnp.ndarray  # int32[]
    max_steps: jnp.ndarray  # int32[] (dynamic for BabyAI levels)
    terminated: jnp.ndarray  # bool[]
    truncated: jnp.ndarray  # bool[]
    mission: jnp.ndarray  # int32[MISSION_DIM]
    rng: jax.Array  # PRNG key used for in-episode randomness + auto-reset
    extra: Any = None


def new_state(
    grid: jnp.ndarray,
    agent_pos,
    agent_dir,
    rng: jax.Array,
    max_steps,
    contains: jnp.ndarray | None = None,
    mission: jnp.ndarray | None = None,
    extra: Any = None,
) -> EnvState:
    """Assemble a fresh episode state with zeroed episode counters."""
    if contains is None:
        contains = jnp.zeros(grid.shape[:2] + (2,), dtype=jnp.uint8)
    if mission is None:
        mission = jnp.zeros((MISSION_DIM,), dtype=jnp.int32)
    return EnvState(
        grid=grid,
        contains=contains,
        agent_pos=jnp.asarray(agent_pos, jnp.int32),
        agent_dir=jnp.asarray(agent_dir, jnp.int32),
        carrying=jnp.zeros((4,), dtype=jnp.uint8),
        step_count=jnp.asarray(0, jnp.int32),
        max_steps=jnp.asarray(max_steps, jnp.int32),
        terminated=jnp.asarray(False),
        truncated=jnp.asarray(False),
        mission=jnp.asarray(mission, jnp.int32),
        rng=rng,
        extra=extra,
    )

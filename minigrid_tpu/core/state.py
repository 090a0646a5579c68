"""Environment state as a pytree of dense arrays.

The reference keeps a Python object graph (`Grid` of `WorldObj` instances,
reference: minigrid/core/grid.py:20-35); here the entire episode state is a
flat struct of arrays so thousands of environments batch under `vmap` and
step under `lax.scan` without leaving the device.

Layout conventions (perf-critical — see tools/perf_probe.py measurements)
--------------------------------------------------------------------------
* ``grid``: int32[W, H] — PACKED cells, type | color << 8 | state << 16.
  The reference's uint8 (W, H, 3) ``Grid.encode`` layout
  (minigrid/core/grid.py:244-268) stays the boundary encoding (observations,
  fixtures, renderer) via constants.pack_grid/unpack_grid; internally the
  packed form keeps batched grids as flat [N, W*H] int32 with full TPU lane
  utilization instead of a layout-hostile size-3 minor dimension.
* ``contains``: int32[W, H] — packed (type | color << 8) of the object hidden
  inside a box at that cell, 0 meaning "nothing".  Replaces the reference's
  ``Box.contains`` object pointer (reference: minigrid/core/world_object.py:274).
* ``carrying``: int32[] — packed held object
  (type | color << 8 | contents_type << 16 | contents_color << 24); 0 = empty
  hands.
* ``agent_x``/``agent_y``: int32[] scalars (NOT an int32[2] vector: tiny
  trailing dims force layout-conversion copies in every fused kernel).
  ``state.agent_pos`` is provided as a convenience property for reset-time /
  host code.
* ``agent_dir``: int32 in [0, 4).
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

from minigrid_tpu.core.constants import pack_carry, pack_grid

# Fixed width of the structured mission vector carried in state/observations.
# mission[0] is a mission-template id; remaining slots are template params
# (color/type indices, coordinates).  Unused slots are zero.
MISSION_DIM = 8


@struct.dataclass
class EnvState:
    grid: jnp.ndarray  # int32[W, H] packed
    contains: jnp.ndarray  # int32[W, H] packed (type | color << 8)
    agent_x: jnp.ndarray  # int32[]
    agent_y: jnp.ndarray  # int32[]
    agent_dir: jnp.ndarray  # int32[]
    carrying: jnp.ndarray  # int32[] packed
    step_count: jnp.ndarray  # int32[]
    max_steps: jnp.ndarray  # int32[] (dynamic for BabyAI levels)
    terminated: jnp.ndarray  # bool[]
    truncated: jnp.ndarray  # bool[]
    mission: jnp.ndarray  # int32[MISSION_DIM]
    rng: jax.Array  # PRNG key used for in-episode randomness + auto-reset
    extra: Any = None

    @property
    def agent_pos(self) -> jnp.ndarray:
        """int32[..., 2] agent position (convenience view; hot paths use the
        scalar fields directly)."""
        return jnp.stack([self.agent_x, self.agent_y], axis=-1)


def _as_packed_grid(grid: jnp.ndarray) -> jnp.ndarray:
    """Accept either a packed int32[W, H] grid or the reference's
    uint8[W, H, 3] encoding."""
    grid = jnp.asarray(grid)
    if grid.ndim == 3 and grid.shape[-1] == 3:
        return pack_grid(grid)
    return grid.astype(jnp.int32)


def _as_packed_contains(contains: jnp.ndarray) -> jnp.ndarray:
    contains = jnp.asarray(contains)
    if contains.ndim == 3 and contains.shape[-1] == 2:
        c = contains.astype(jnp.int32)
        return c[..., 0] | (c[..., 1] << 8)
    return contains.astype(jnp.int32)


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
    """Assemble a fresh episode state with zeroed episode counters.

    ``grid``/``contains`` accept both the packed int32 layout and the
    reference's uint8 plane encoding (auto-packed).
    """
    grid = _as_packed_grid(grid)
    if contains is None:
        contains = jnp.zeros(grid.shape[:2], dtype=jnp.int32)
    else:
        contains = _as_packed_contains(contains)
    if mission is None:
        mission = jnp.zeros((MISSION_DIM,), dtype=jnp.int32)
    return EnvState(
        grid=grid,
        contains=contains,
        agent_x=jnp.asarray(agent_pos[0], jnp.int32),
        agent_y=jnp.asarray(agent_pos[1], jnp.int32),
        agent_dir=jnp.asarray(agent_dir, jnp.int32),
        carrying=pack_carry(0),
        step_count=jnp.asarray(0, jnp.int32),
        max_steps=jnp.asarray(max_steps, jnp.int32),
        terminated=jnp.asarray(False),
        truncated=jnp.asarray(False),
        mission=jnp.asarray(mission, jnp.int32),
        rng=rng,
        extra=extra,
    )

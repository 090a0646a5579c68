"""DoorKey (reference: minigrid/envs/doorkey.py:9-100)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    COLOR_YELLOW,
    GOAL_CELL,
    OBJ_DOOR,
    OBJ_KEY,
    STATE_LOCKED,
    WALL_CELL,
    cell,
)
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("use the key to open the door and then get to the goal")


class DoorKeyEnv(MiniGridEnv):
    """Room split by a vertical wall with a locked yellow door; the key is on
    the agent's side (reference: minigrid/envs/doorkey.py:75-100)."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(self, size: int = 8, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 10 * size**2
        super().__init__(width=size, height=size, max_steps=max_steps, **kwargs)

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        k_split, k_agent, k_dir, k_door, k_key, k_carry = jax.random.split(key, 6)

        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, w - 2, h - 2, GOAL_CELL)

        # Vertical splitting wall at a random column in [2, w-2).
        split_idx = randint(k_split, 2, w - 2)
        grid = g.put(grid, g.vert_wall_mask(w, h, split_idx, 0), WALL_CELL)

        # Agent at a random free cell strictly left of the wall.
        agent_pos = place_obj_pos(k_agent, grid, size=(split_idx, h))
        agent_dir = rand_dir(k_dir)

        # Locked yellow door at a random row in [1, h-2).
        door_idx = randint(k_door, 1, h - 2)
        grid = g.set_cell(
            grid, split_idx, door_idx, cell(OBJ_DOOR, COLOR_YELLOW, STATE_LOCKED)
        )

        # Yellow key on the left side.
        key_pos = place_obj_pos(k_key, grid, agent_pos=agent_pos, size=(split_idx, h))
        grid = g.set_cell(grid, key_pos[0], key_pos[1], cell(OBJ_KEY, COLOR_YELLOW))

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "use the key to open the door and then get to the goal"

"""LavaGap (reference: minigrid/envs/lavagap.py:101-136)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import EMPTY_CELL, GOAL_CELL, LAVA_CELL, WALL_CELL
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.core.state import EnvState, new_state

_MISSION_LAVA = register_mission("avoid the lava and get to the green goal square")
_MISSION_WALL = register_mission("find the opening and get to the green goal square")


class LavaGapEnv(MiniGridEnv):
    """Vertical obstacle wall with a single gap
    (reference: minigrid/envs/lavagap.py:75-136)."""

    def __init__(
        self,
        size: int,
        obstacle_type: str = "lava",
        max_steps: int | None = None,
        **kwargs,
    ):
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(
            width=size,
            height=size,
            max_steps=max_steps,
            see_through_walls=False,
            **kwargs,
        )
        assert obstacle_type in ("lava", "wall")
        self.obstacle_type = obstacle_type

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        k_gx, k_gy, k_carry = jax.random.split(key, 3)
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, w - 2, h - 2, GOAL_CELL)
        gap_x = randint(k_gx, 2, w - 2)
        gap_y = randint(k_gy, 1, h - 1)
        obstacle = LAVA_CELL if self.obstacle_type == "lava" else WALL_CELL
        grid = g.put(grid, g.vert_wall_mask(w, h, gap_x, 1, h - 2), obstacle)
        grid = g.set_cell(grid, gap_x, gap_y, EMPTY_CELL)
        mission = _MISSION_LAVA if self.obstacle_type == "lava" else _MISSION_WALL
        return new_state(
            grid=grid,
            agent_pos=jnp.asarray((1, 1), jnp.int32),
            agent_dir=0,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(mission),
        )

    def mission_text(self, mission=None) -> str:
        if self.obstacle_type == "lava":
            return "avoid the lava and get to the green goal square"
        return "find the opening and get to the green goal square"


# Kernel specialization (core/env.py flags): LavaGap grids hold only
# wall/lava/goal cells and the mission depends only on the obstacle type.
LavaGapEnv.fused_no_objects = True
LavaGapEnv.fused_static_mission = True

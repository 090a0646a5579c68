"""Empty room (reference: minigrid/envs/empty.py:9-114)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import GOAL_CELL
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("get to the green goal square")


class EmptyEnv(MiniGridEnv):
    """Walled empty room; goal in the bottom-right corner; fixed or random
    agent start (reference: minigrid/envs/empty.py:97-114)."""

    def __init__(
        self,
        size: int = 8,
        agent_start_pos: tuple[int, int] | None = (1, 1),
        agent_start_dir: int = 0,
        max_steps: int | None = None,
        **kwargs,
    ):
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(
            width=size,
            height=size,
            max_steps=max_steps,
            see_through_walls=True,
            **kwargs,
        )
        self.agent_start_pos = agent_start_pos
        self.agent_start_dir = agent_start_dir

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, w - 2, h - 2, GOAL_CELL)

        k_pos, k_dir, k_carry = jax.random.split(key, 3)
        if self.agent_start_pos is not None:
            pos = jnp.asarray(self.agent_start_pos, jnp.int32)
            direction = jnp.asarray(self.agent_start_dir, jnp.int32)
        else:
            pos = place_obj_pos(k_pos, grid)
            direction = rand_dir(k_dir)

        return new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "get to the green goal square"


# Kernel specialization (core/env.py flags): Empty grids hold only
# wall/goal cells and the mission is a family constant.
EmptyEnv.fused_no_objects = True
EmptyEnv.fused_static_mission = True

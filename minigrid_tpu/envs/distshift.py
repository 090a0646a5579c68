"""DistShift (reference: minigrid/envs/distshift.py:99-121)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import GOAL_CELL, LAVA_CELL
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("get to the green goal square")


class DistShiftEnv(MiniGridEnv):
    """Two lava strips; variant 1 has the second strip at row 2, variant 2 at
    row 5 (reference: minigrid/envs/distshift.py:65-121)."""

    # Fixed layout, fixed start: the level is key-independent
    # (core/env.py deterministic_generation).
    deterministic_generation = True

    def __init__(
        self,
        width: int = 9,
        height: int = 7,
        agent_start_pos: tuple[int, int] = (1, 1),
        agent_start_dir: int = 0,
        strip2_row: int = 2,
        max_steps: int | None = None,
        **kwargs,
    ):
        if max_steps is None:
            max_steps = 4 * width * height
        super().__init__(
            width=width,
            height=height,
            max_steps=max_steps,
            see_through_walls=True,
            **kwargs,
        )
        self.agent_start_pos = agent_start_pos
        self.agent_start_dir = agent_start_dir
        self.goal_pos = (width - 2, 1)
        self.strip2_row = strip2_row

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, self.goal_pos[0], self.goal_pos[1], GOAL_CELL)
        strip_len = w - 6
        grid = g.put(grid, g.horz_wall_mask(w, h, 3, 1, strip_len), LAVA_CELL)
        grid = g.put(
            grid, g.horz_wall_mask(w, h, 3, self.strip2_row, strip_len), LAVA_CELL
        )
        return new_state(
            grid=grid,
            agent_pos=jnp.asarray(self.agent_start_pos, jnp.int32),
            agent_dir=self.agent_start_dir,
            rng=key,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "get to the green goal square"


# Kernel specialization (core/env.py flags): DistShift grids hold only
# wall/lava/goal cells and the mission is a family constant.
DistShiftEnv.fused_no_objects = True
DistShiftEnv.fused_static_mission = True

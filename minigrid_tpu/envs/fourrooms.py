"""FourRooms (reference: minigrid/envs/fourrooms.py:9-127)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import EMPTY_CELL, GOAL_CELL, WALL_CELL
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("reach the goal")


class FourRoomsEnv(MiniGridEnv):
    """Classic four-rooms layout: 2x2 rooms with one randomly placed gap per
    inter-room wall (reference: minigrid/envs/fourrooms.py:79-127)."""

    # Per-step fused autoreset would regenerate the 19x19 layout (wall
    # masks + two rejection placements over 361 cells) every step for every
    # env; at max_steps=100 that generation dominated the rollout (22.9M
    # steps/s measured round 3).  The reset cache amortizes it per chunk.
    expensive_reset = True

    def __init__(
        self,
        agent_pos: tuple[int, int] | None = None,
        goal_pos: tuple[int, int] | None = None,
        size: int = 19,
        max_steps: int = 100,
        **kwargs,
    ):
        super().__init__(width=size, height=size, max_steps=max_steps, **kwargs)
        self._agent_default_pos = agent_pos
        self._goal_default_pos = goal_pos

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        room_w, room_h = w // 2, h // 2
        keys = jax.random.split(key, 8)

        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)

        # Inter-room walls (loop order follows reference :93-111).
        grid = g.put(grid, g.vert_wall_mask(w, h, room_w, 0, room_h), WALL_CELL)
        gap0 = randint(keys[0], 1, room_h)  # (room_w, gap0)
        grid = g.put(grid, g.horz_wall_mask(w, h, 0, room_h, room_w), WALL_CELL)
        gap1 = randint(keys[1], 1, room_w)  # (gap1, room_h)
        grid = g.put(grid, g.horz_wall_mask(w, h, room_w, room_h, room_w), WALL_CELL)
        gap2 = randint(keys[2], room_w + 1, 2 * room_w)  # (gap2, room_h)
        grid = g.put(grid, g.vert_wall_mask(w, h, room_w, room_h, room_h), WALL_CELL)
        gap3 = randint(keys[3], room_h + 1, 2 * room_h)  # (room_w, gap3)
        grid = g.set_cell(grid, room_w, gap0, EMPTY_CELL)
        grid = g.set_cell(grid, gap1, room_h, EMPTY_CELL)
        grid = g.set_cell(grid, gap2, room_h, EMPTY_CELL)
        grid = g.set_cell(grid, room_w, gap3, EMPTY_CELL)

        if self._agent_default_pos is not None:
            agent_pos = jnp.asarray(self._agent_default_pos, jnp.int32)
            grid = g.set_cell(grid, agent_pos[0], agent_pos[1], EMPTY_CELL)
            agent_dir = rand_dir(keys[4])
        else:
            agent_pos = place_obj_pos(keys[4], grid)
            agent_dir = rand_dir(keys[5])

        if self._goal_default_pos is not None:
            gp = self._goal_default_pos
            grid = g.set_cell(grid, gp[0], gp[1], GOAL_CELL)
        else:
            goal_pos = place_obj_pos(keys[6], grid, agent_pos=agent_pos)
            grid = g.set_cell(grid, goal_pos[0], goal_pos[1], GOAL_CELL)

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=keys[7],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "reach the goal"


# Kernel specialization (core/env.py flags): FourRooms grids hold only
# wall/goal cells and the mission is a family constant.
FourRoomsEnv.fused_no_objects = True
FourRoomsEnv.fused_static_mission = True

"""Playground (reference: minigrid/envs/playground.py:10-91)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    OBJ_DOOR,
    SORTED_COLOR_IDX,
    STATE_CLOSED,
    WALL_CELL,
    cell,
)
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.roomgrid import KIND_TABLE
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("")


class PlaygroundEnv(MiniGridEnv):
    """3x3 rooms with doors and 12 random objects; no goal or reward
    (reference: minigrid/envs/playground.py:31-91)."""

    def __init__(self, max_steps: int = 100, **kwargs):
        super().__init__(width=19, height=19, max_steps=max_steps, **kwargs)

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        room_w, room_h = w // 3, h // 3
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)

        keys = jax.random.split(key, 64)
        ki = 0

        def next_key():
            nonlocal ki
            ki += 1
            return keys[ki - 1]

        # Room walls + randomly placed colored doors (reference :45-65).
        for j in range(3):
            for i in range(3):
                xl, yt = i * room_w, j * room_h
                xr, yb = xl + room_w, yt + room_h
                if i + 1 < 3:
                    grid = g.put(grid, g.vert_wall_mask(w, h, xr, yt, room_h), WALL_CELL)
                    y = randint(next_key(), yt + 1, yb - 1)
                    c = jnp.asarray(SORTED_COLOR_IDX)[randint(next_key(), 0, 6)]
                    grid = g.set_cell(grid, xr, y, cell(OBJ_DOOR, c, STATE_CLOSED))
                if j + 1 < 3:
                    grid = g.put(grid, g.horz_wall_mask(w, h, xl, yb, room_w), WALL_CELL)
                    x = randint(next_key(), xl + 1, xr - 1)
                    c = jnp.asarray(SORTED_COLOR_IDX)[randint(next_key(), 0, 6)]
                    grid = g.set_cell(grid, x, yb, cell(OBJ_DOOR, c, STATE_CLOSED))

        agent_pos = place_obj_pos(next_key(), grid)
        agent_dir = rand_dir(next_key())

        # 12 random objects (reference :71-87).
        for _ in range(12):
            kind = KIND_TABLE[randint(next_key(), 0, 3)]
            color = jnp.asarray(SORTED_COLOR_IDX)[randint(next_key(), 0, 6)]
            pos = place_obj_pos(next_key(), grid, agent_pos=agent_pos)
            grid = g.set_cell(grid, pos[0], pos[1], cell(kind, color))

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=next_key(),
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return ""

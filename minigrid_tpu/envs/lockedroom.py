"""LockedRoom (reference: minigrid/envs/lockedroom.py:24-174)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    GOAL_CELL,
    OBJ_DOOR,
    OBJ_KEY,
    SORTED_COLOR_IDX,
    STATE_CLOSED,
    STATE_LOCKED,
    WALL_CELL,
    cell,
)
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import randint, sample_mask_cell
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission(
    "get the {0} key from the {1} room, unlock the {2} door and go to the goal",
    ("color", "color", "color"),
)


class LockedRoomEnv(MiniGridEnv):
    """Fixed 19x19 layout: 2x3 rooms flanking a central hallway; one room is
    locked and holds the goal, its key lies in another room
    (reference: minigrid/envs/lockedroom.py:95-174)."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(self, size: int = 19, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 10 * size
        super().__init__(width=size, height=size, max_steps=max_steps, **kwargs)
        # Static room geometry (reference :109-131).
        w = h = size
        self.l_wall = w // 2 - 2
        self.r_wall = w // 2 + 2
        room_w = self.l_wall + 1
        room_h = h // 3 + 1
        tops, door_pos = [], []
        for n in range(3):
            j = n * (h // 3)
            tops.append((0, j))
            door_pos.append((self.l_wall, j + 3))
            tops.append((self.r_wall, j))
            door_pos.append((self.r_wall, j + 3))
        self.room_tops = np.asarray(tops, np.int32)  # [6, 2]
        self.room_size_wh = (room_w, room_h)
        self.door_positions = np.asarray(door_pos, np.int32)  # [6, 2]

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        keys = jax.random.split(key, 10)
        grid = g.empty_grid(w, h)
        grid = g.wall_rect(grid, 0, 0, w, h)
        # Hallway walls (reference :109-113).
        grid = g.put(grid, g.vert_wall_mask(w, h, self.l_wall, 0), WALL_CELL)
        grid = g.put(grid, g.vert_wall_mask(w, h, self.r_wall, 0), WALL_CELL)
        # Room splitting walls (reference :118-124).
        for n in range(3):
            j = n * (h // 3)
            grid = g.put(grid, g.horz_wall_mask(w, h, 0, j, self.l_wall), WALL_CELL)
            grid = g.put(grid, g.horz_wall_mask(w, h, self.r_wall, j, w - self.r_wall), WALL_CELL)

        room_w, room_h = self.room_size_wh
        tops = jnp.asarray(self.room_tops)
        doors = jnp.asarray(self.door_positions)

        # Locked room + goal inside it (reference :133-137; rand_pos is a raw
        # uniform draw over the interior, no emptiness check).
        locked_idx = randint(keys[0], 0, 6)
        lt = tops[locked_idx]
        gx = lt[0] + 1 + randint(keys[1], 0, room_w - 2)
        gy = lt[1] + 1 + randint(keys[2], 0, room_h - 2)
        grid = g.set_cell(grid, gx, gy, GOAL_CELL)

        # Door colors: a random permutation of all six (reference :139-147
        # removes each sampled color from the pool).
        colors = jnp.asarray(SORTED_COLOR_IDX)[jax.random.permutation(keys[3], 6)]
        for r in range(6):
            is_locked = locked_idx == r
            door_state = jnp.where(is_locked, STATE_LOCKED, STATE_CLOSED)
            grid = g.set_cell(
                grid, doors[r][0], doors[r][1], cell(OBJ_DOOR, colors[r], door_state)
            )
        locked_color = colors[locked_idx]

        # Key room != locked room (reference :150-154), key of the locked
        # room's color at a raw uniform interior position (:155-156).
        key_room = (locked_idx + 1 + randint(keys[4], 0, 5)) % 6
        kt = tops[key_room]
        kx = kt[0] + 1 + randint(keys[5], 0, room_w - 2)
        ky = kt[1] + 1 + randint(keys[6], 0, room_h - 2)
        grid = g.set_cell(
            grid, kx, ky,
            cell(jnp.asarray(OBJ_KEY, jnp.int32), locked_color),
        )

        # Agent in the hallway (reference :159-161).
        hall = g.rect_mask(w, h, self.l_wall, 0, self.r_wall - self.l_wall, h)
        agent_pos = sample_mask_cell(keys[7], g.free_mask(grid) & hall)
        agent_dir = randint(keys[8], 0, 4)

        key_room_color = colors[key_room]
        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=keys[9],
            max_steps=self.max_steps,
            mission=mission_vec(
                _MISSION,
                locked_color.astype(jnp.int32),
                key_room_color.astype(jnp.int32),
                locked_color.astype(jnp.int32),
            ),
        )

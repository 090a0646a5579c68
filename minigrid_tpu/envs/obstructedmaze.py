"""ObstructedMaze v0 + v1 (reference: minigrid/envs/obstructedmaze.py:9-271,
minigrid/envs/obstructedmaze_v1.py:9-99)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import (
    COLOR_BLUE,
    COLOR_GREEN,
    COLOR_GREY,
    OBJ_BALL,
    OBJ_BOX,
    OBJ_KEY,
    SORTED_COLOR_IDX,
    carry_color,
    carry_type,
    cell,
)
from minigrid_tpu.core.env import success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.envs.unlock import RoomGridEnvBase
from minigrid_tpu.ops import fused_ext as fx

_MISSION = register_mission("pick up the {0} ball", ("color",))

# Reference color scheme (obstructedmaze.py:116-122): target ball is
# COLOR_NAMES[0]="blue", blocking balls COLOR_NAMES[1]="green", boxes
# COLOR_NAMES[2]="grey".
_BALL_COLOR = COLOR_BLUE
_BLOCK_COLOR = COLOR_GREEN
_BOX_COLOR = COLOR_GREY

_DIRS = ((1, 0), (0, 1), (-1, 0), (0, -1))


class ObstructedMazeEnv(RoomGridEnvBase):
    """Shared machinery: locked doors with (possibly boxed) keys and blocking
    balls; success = picking up the blue ball
    (reference: minigrid/envs/obstructedmaze.py:126-167)."""

    # Flat-pool reset cache: measured 1.7 -> 0.98 ms for the 8192x2 cache
    # (scanned marginal, v5e); see MiniGridEnv.flat_reset_pool.
    flat_reset_pool = True

    def __init__(self, num_rows: int, num_cols: int, num_rooms_visited: int, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 4 * num_rooms_visited * room_size**2
        super().__init__(room_size, num_rows, num_cols, max_steps, **kwargs)

    # -- building blocks -------------------------------------------------------
    def _door_colors(self, key):
        """Random permutation of the six sorted colors (reference :116)."""
        return jnp.asarray(SORTED_COLOR_IDX)[jax.random.permutation(key, 6)]

    def _add_obstructed_door(self, key, s, boxed_keys, i, j, door_idx, color, locked, key_in_box, blocked, add_key=True):
        """Reference obstructedmaze.py:136-167: door (+ blocking ball inside
        room (i,j), + key possibly hidden in a box)."""
        k_door, k_key = jax.random.split(key)
        s, color, pos = self.builder.add_door(k_door, s, i, j, door_idx, color=color, locked=locked)
        if blocked:
            dx, dy = _DIRS[door_idx]
            ball = cell(jnp.asarray(OBJ_BALL, jnp.int32), jnp.asarray(_BLOCK_COLOR, jnp.int32))
            s = s.replace(grid=g.set_cell(s.grid, pos[0] - dx, pos[1] - dy, ball))
        if locked and add_key:
            s, boxed_keys = self._add_key(k_key, s, boxed_keys, i, j, color, key_in_box)
        return s, boxed_keys, color

    def _add_key(self, key, s, boxed_keys, i, j, color, key_in_box):
        """Key of ``color`` in room (i,j), inside a grey box if key_in_box
        (reference obstructedmaze_v1.py:87-99)."""
        if key_in_box:
            cell_value = cell(jnp.asarray(OBJ_BOX, jnp.int32), jnp.asarray(_BOX_COLOR, jnp.int32))
        else:
            cell_value = cell(jnp.asarray(OBJ_KEY, jnp.int32), color)
        s, pos = self.builder.place_in_room(key, s, i, j, cell_value)
        if key_in_box:
            boxed_keys = boxed_keys + [(pos, color)]
        return s, boxed_keys

    def _finish(self, key_carry, s, boxed_keys):
        contains = jnp.zeros((self.width, self.height), jnp.int32)
        for pos, color in boxed_keys:
            packed = jnp.asarray(OBJ_KEY, jnp.int32) | (jnp.asarray(color, jnp.int32) << 8)
            contains = g.set_cell(contains, pos[0], pos[1], packed)
        return new_state(
            grid=s.grid,
            agent_pos=s.agent_pos,
            agent_dir=s.agent_dir,
            rng=key_carry,
            max_steps=self.max_steps,
            contains=contains,
            mission=mission_vec(_MISSION, _BALL_COLOR),
        )

    def _post_step(self, prev_state, state, action, reward):
        success = (
            (jnp.asarray(action, jnp.int32) == Actions.pickup)
            & (carry_type(state.carrying) == OBJ_BALL)
            & (carry_color(state.carrying) == _BALL_COLOR)
        )
        reward = jnp.where(success, success_reward(state), reward)
        return state.replace(terminated=state.terminated | success), reward


class ObstructedMaze_1Dlhb(ObstructedMazeEnv):
    """2x1 maze, one locked door (reference: obstructedmaze.py:170-196)."""

    def __init__(self, key_in_box: bool = True, blocked: bool = True, **kwargs):
        self.key_in_box = bool(key_in_box)
        self.blocked = bool(blocked)
        super().__init__(num_rows=1, num_cols=2, num_rooms_visited=2, **kwargs)

    def _generate(self, key: jax.Array) -> EnvState:
        b = self.builder
        keys = jax.random.split(key, 6)
        s = b.init(keys[0])
        colors = self._door_colors(keys[1])
        boxed: list = []
        s, boxed, _ = self._add_obstructed_door(
            keys[2], s, boxed, 0, 0, 0,
            color=colors[0], locked=True,
            key_in_box=self.key_in_box, blocked=self.blocked,
        )
        ball = cell(jnp.asarray(OBJ_BALL, jnp.int32), jnp.asarray(_BALL_COLOR, jnp.int32))
        s, _ = b.place_in_room(keys[3], s, 1, 0, ball)
        s = b.place_agent(keys[4], s, 0, 0)
        return self._finish(keys[5], s, boxed)


class ObstructedMaze_Full(ObstructedMazeEnv):
    """3x3 maze with per-quarter locked doors
    (reference: obstructedmaze.py:199-256)."""

    v1 = False  # v1 adds all keys after all doors+blocking balls (obstructedmaze_v1.py)

    def __init__(
        self,
        agent_room: tuple[int, int] = (1, 1),
        key_in_box: bool = True,
        blocked: bool = True,
        num_quarters: int = 4,
        num_rooms_visited: int = 25,
        **kwargs,
    ):
        self.agent_room = tuple(agent_room)
        self.key_in_box = bool(key_in_box)
        self.blocked = bool(blocked)
        self.num_quarters = int(num_quarters)
        super().__init__(num_rows=3, num_cols=3, num_rooms_visited=num_rooms_visited, **kwargs)

    def _generate(self, key: jax.Array) -> EnvState:
        b = self.builder
        nq = self.num_quarters
        keys = jax.random.split(key, 8 + 6 * nq)
        s = b.init(keys[0])
        colors = self._door_colors(keys[1])
        boxed: list = []

        side_rooms = [(2, 1), (1, 2), (0, 1), (1, 0)][:nq]
        ki = 2
        deferred_keys = []
        for i, side in enumerate(side_rooms):
            # Open door middle -> side room (reference :234-237).
            s, _, _ = b.add_door(keys[ki], s, 1, 1, i, color=colors[i], locked=False)
            ki += 1
            for k in (-1, 1):
                d_idx = (i + k) % 4
                c = colors[(i + k) % 6]
                s, boxed, _ = self._add_obstructed_door(
                    keys[ki], s, boxed, side[0], side[1], d_idx,
                    color=c, locked=True,
                    key_in_box=self.key_in_box, blocked=self.blocked,
                    add_key=not self.v1,
                )
                ki += 1
                if self.v1:
                    deferred_keys.append((side, c))
            if self.v1:
                # Keys added after the doors and blocking balls (v1 fix,
                # obstructedmaze_v1.py:61-67).
                for side_, c_ in deferred_keys:
                    s, boxed = self._add_key(keys[ki], s, boxed, side_[0], side_[1], c_, self.key_in_box)
                    ki += 1
                deferred_keys = []

        corners = [(2, 0), (2, 2), (0, 2), (0, 0)][:nq]
        corner_idx = randint(keys[ki], 0, nq)
        ki += 1
        corner_x = jnp.asarray(np.asarray([c[0] for c in corners], np.int32))[corner_idx]
        corner_y = jnp.asarray(np.asarray([c[1] for c in corners], np.int32))[corner_idx]
        ball = cell(jnp.asarray(OBJ_BALL, jnp.int32), jnp.asarray(_BALL_COLOR, jnp.int32))
        s, _ = b.place_in_room(keys[ki], s, corner_x, corner_y, ball)
        ki += 1
        s = b.place_agent(keys[ki], s, self.agent_room[0], self.agent_room[1])
        ki += 1
        return self._finish(keys[ki], s, boxed)


class ObstructedMaze_Full_V1(ObstructedMaze_Full):
    v1 = True


class _ObstructedMazeFusedExt(fx.FusedExt):
    """Block twin of ObstructedMazeEnv._post_step (no extra state): success is
    a pickup action holding the blue ball."""

    def post_step(self, ctx):
        carry = ctx.sc[fx.ROW_CARRY]
        success = (
            (ctx.action == Actions.pickup)
            & (fx.carry_type(carry) == OBJ_BALL)
            & (fx.carry_color(carry) == _BALL_COLOR)
        )
        reward = jnp.where(success, ctx.success_reward(), ctx.reward)
        return success, reward, ctx.scal, ctx.planes


ObstructedMazeEnv.fused_ext = _ObstructedMazeFusedExt()

"""RedBlueDoors (reference: minigrid/envs/redbluedoors.py:62-127)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    COLOR_BLUE,
    COLOR_RED,
    OBJ_DOOR,
    STATE_CLOSED,
    STATE_OPEN,
    cell,
    cell_state,
)
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx

_MISSION = register_mission("open the red door then the blue door")


class RedBlueDoorEnv(MiniGridEnv):
    """Double room; red door on the inner-left wall, blue on the right; the
    doors must be opened red-first (reference: minigrid/envs/redbluedoors.py:81-127)."""

    def __init__(self, size: int = 8, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 20 * size**2
        super().__init__(width=2 * size, height=size, max_steps=max_steps, **kwargs)
        self.size = size

    def _generate(self, key: jax.Array) -> EnvState:
        s = self.size
        w, h = self.width, self.height
        keys = jax.random.split(key, 5)
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, 2 * s, s)
        grid = g.wall_rect(grid, s // 2, 0, s, s)

        agent_pos = place_obj_pos(keys[0], grid, top=(s // 2, 0), size=(s, s))
        agent_dir = rand_dir(keys[1])

        red_y = randint(keys[2], 1, s - 1)
        blue_y = randint(keys[3], 1, s - 1)
        red_pos = jnp.stack([jnp.int32(s // 2), red_y])
        blue_pos = jnp.stack([jnp.int32(s // 2 + s - 1), blue_y])
        grid = g.set_cell(grid, red_pos[0], red_pos[1], cell(OBJ_DOOR, COLOR_RED, STATE_CLOSED))
        grid = g.set_cell(grid, blue_pos[0], blue_pos[1], cell(OBJ_DOOR, COLOR_BLUE, STATE_CLOSED))

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=keys[4],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
            extra={"red_pos": red_pos, "blue_pos": blue_pos},
        )

    def _post_step(self, prev_state, state, action, reward):
        red, blue = state.extra["red_pos"], state.extra["blue_pos"]
        red_before = cell_state(g.get_cell(prev_state.grid, red[0], red[1])) == STATE_OPEN
        blue_before = cell_state(g.get_cell(prev_state.grid, blue[0], blue[1])) == STATE_OPEN
        red_after = cell_state(g.get_cell(state.grid, red[0], red[1])) == STATE_OPEN
        blue_after = cell_state(g.get_cell(state.grid, blue[0], blue[1])) == STATE_OPEN

        # blue open => success iff red was already open (reference :114-120);
        # red open after blue was open => failure (:122-125, defensive).
        success = blue_after & red_before
        failure = (blue_after & ~red_before) | (red_after & ~blue_after & blue_before)
        reward = jnp.where(success, success_reward(state), jnp.where(failure, 0.0, reward))
        terminated = state.terminated | success | failure
        return state.replace(terminated=terminated), reward

    def mission_text(self, mission=None) -> str:
        return "open the red door then the blue door"


class _RedBlueDoorsFusedExt(fx.FusedExt):
    """Block twin of RedBlueDoorEnv._post_step: blue open after red succeeds,
    out-of-order opens fail (door states read from the pre/post grids)."""

    n_scalars = 4

    def pack_extra(self, env, extra):
        return fx.pack_pos_pairs(extra["red_pos"], extra["blue_pos"]), None

    def unpack_extra(self, env, scal, planes):
        return {"red_pos": scal[..., 0:2], "blue_pos": scal[..., 2:4]}

    def post_step(self, ctx):
        rx, ry, bx, by = ctx.scal
        is_open = lambda cell: fx.cell_state_bits(cell) == STATE_OPEN
        red_before = is_open(ctx.read_xy(ctx.g_prev, rx, ry))
        blue_before = is_open(ctx.read_xy(ctx.g_prev, bx, by))
        red_after = is_open(ctx.read_xy(ctx.g_post, rx, ry))
        blue_after = is_open(ctx.read_xy(ctx.g_post, bx, by))

        success = blue_after & red_before
        failure = (blue_after & ~red_before) | (red_after & ~blue_after & blue_before)
        reward = jnp.where(
            success, ctx.success_reward(), jnp.where(failure, 0.0, ctx.reward)
        )
        return success | failure, reward, ctx.scal, ctx.planes


RedBlueDoorEnv.fused_ext = _RedBlueDoorsFusedExt()

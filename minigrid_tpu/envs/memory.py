"""Memory (reference: minigrid/envs/memory.py:12-165)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import (
    COLOR_GREEN,
    OBJ_BALL,
    OBJ_KEY,
    WALL_CELL,
    cell,
)
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx

_MISSION = register_mission("go to the matching object at the end of the hallway")


class MemoryEnv(MiniGridEnv):
    """Cue object in the start room; two candidates at the hallway split; the
    agent must walk to the one matching the cue
    (reference: minigrid/envs/memory.py:94-165)."""

    def __init__(self, size: int = 13, random_length: bool = False, max_steps: int | None = None, **kwargs):
        assert size % 2 == 1
        if max_steps is None:
            max_steps = 5 * size**2
        super().__init__(
            width=size,
            height=size,
            max_steps=max_steps,
            see_through_walls=False,
            **kwargs,
        )
        self.random_length = bool(random_length)

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        keys = jax.random.split(key, 5)
        xs, ys = g.coord_grids(w, h)
        mid = h // 2
        upper = mid - 2
        lower = mid + 2

        if self.random_length:
            hallway_end = randint(keys[0], 4, w - 2)
        else:
            hallway_end = jnp.int32(w - 3)

        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        # Start room (reference :112-116).
        grid = g.put(grid, g.horz_wall_mask(w, h, 1, upper, 4), WALL_CELL)
        grid = g.put(grid, g.horz_wall_mask(w, h, 1, lower, 4), WALL_CELL)
        grid = g.set_cell(grid, 4, upper + 1, WALL_CELL)
        grid = g.set_cell(grid, 4, lower - 1, WALL_CELL)
        # Horizontal hallway (reference :119-121): x in [5, hallway_end).
        hall = (xs >= 5) & (xs < hallway_end)
        grid = g.put(grid, hall & (ys == upper + 1), WALL_CELL)
        grid = g.put(grid, hall & (ys == lower - 1), WALL_CELL)
        # Vertical hallway (reference :124-127).
        grid = g.put(grid, (xs == hallway_end) & (ys != mid), WALL_CELL)
        grid = g.put(grid, (xs == hallway_end + 2), WALL_CELL)
        # Re-wall the perimeter column pieces possibly cleared above: nothing
        # cleared; boundary stays intact.

        agent_x = randint(keys[1], 1, hallway_end + 1)
        agent_pos = jnp.stack([agent_x, jnp.int32(mid)])

        # Cue and candidates (reference :134-141).
        start_is_key = randint(keys[2], 0, 2) == 0
        cue = jnp.where(start_is_key, OBJ_KEY, OBJ_BALL)
        grid = g.set_cell(grid, 1, mid - 1, cell(cue, jnp.asarray(COLOR_GREEN, jnp.int32)))

        first_is_ball = randint(keys[3], 0, 2) == 0
        obj0 = jnp.where(first_is_ball, OBJ_BALL, OBJ_KEY)
        obj1 = jnp.where(first_is_ball, OBJ_KEY, OBJ_BALL)
        pos0 = jnp.stack([hallway_end + 1, jnp.int32(mid - 2)])
        pos1 = jnp.stack([hallway_end + 1, jnp.int32(mid + 2)])
        green = jnp.asarray(COLOR_GREEN, jnp.int32)
        grid = g.set_cell(grid, pos0[0], pos0[1], cell(obj0, green))
        grid = g.set_cell(grid, pos1[0], pos1[1], cell(obj1, green))

        # success/failure cells one step inside (reference :144-149).
        match0 = cue == obj0
        success_pos = jnp.where(match0, pos0 + jnp.array([0, 1]), pos1 - jnp.array([0, 1]))
        failure_pos = jnp.where(match0, pos1 - jnp.array([0, 1]), pos0 + jnp.array([0, 1]))

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=jnp.int32(0),
            rng=keys[4],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
            extra={"success_pos": success_pos, "failure_pos": failure_pos},
        )

    def _map_action(self, action):
        # pickup acts as toggle (reference :154-155).
        a = jnp.asarray(action, jnp.int32)
        return jnp.where(a == Actions.pickup, jnp.int32(Actions.toggle), a)

    def _post_step(self, prev_state, state, action, reward):
        at_success = (state.agent_pos == state.extra["success_pos"]).all()
        at_failure = (state.agent_pos == state.extra["failure_pos"]).all()
        reward = jnp.where(at_success, success_reward(state), jnp.where(at_failure, 0.0, reward))
        terminated = state.terminated | at_success | at_failure
        return state.replace(terminated=terminated), reward

    def mission_text(self, mission=None) -> str:
        return "go to the matching object at the end of the hallway"


class _MemoryFusedExt(fx.FusedExt):
    """Block twin of MemoryEnv hooks: pickup acts as toggle; reaching the
    success/failure hallway-end cell terminates."""

    n_scalars = 4

    def pack_extra(self, env, extra):
        return fx.pack_pos_pairs(extra["success_pos"], extra["failure_pos"]), None

    def unpack_extra(self, env, scal, planes):
        return {"success_pos": scal[..., 0:2], "failure_pos": scal[..., 2:4]}

    def map_action(self, env, a):
        return jnp.where(a == Actions.pickup, jnp.int32(Actions.toggle), a)

    def post_step(self, ctx):
        ax, ay = ctx.sc[fx.ROW_AX], ctx.sc[fx.ROW_AY]
        at_success = (ax == ctx.scal[0]) & (ay == ctx.scal[1])
        at_failure = (ax == ctx.scal[2]) & (ay == ctx.scal[3])
        reward = jnp.where(
            at_success,
            ctx.success_reward(),
            jnp.where(at_failure, 0.0, ctx.reward),
        )
        return at_success | at_failure, reward, ctx.scal, ctx.planes


MemoryEnv.fused_ext = _MemoryFusedExt()

"""Dynamic-Obstacles (reference: minigrid/envs/dynamicobstacles.py:13-167)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    COLOR_BLUE,
    EMPTY_CELL,
    GOAL_CELL,
    OBJ_BALL,
    OBJ_EMPTY,
    OBJ_GOAL,
    cell,
)
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import (
    neighbor_mask,
    place_obj_pos,
    rand_dir,
    sample_mask_cell,
)
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("get to the green goal square")

BALL_CELL = cell(OBJ_BALL, COLOR_BLUE)


class DynamicObstaclesEnv(MiniGridEnv):
    """Empty room with randomly walking ball obstacles; stepping into one
    (or any non-goal blocked cell) gives reward -1 and terminates
    (reference: minigrid/envs/dynamicobstacles.py:136-167).

    Obstacle positions live in ``state.extra["obstacles"]`` (int32[n, 2]);
    each obstacle re-samples uniformly among free cells of its 3x3
    neighborhood before the agent acts, in index order (the reference's
    sequential ``place_obj`` loop :146-156; an obstacle with no free
    neighbor stays put, mirroring the swallowed placement failure).
    """

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(
        self,
        size: int = 8,
        agent_start_pos: tuple[int, int] | None = (1, 1),
        agent_start_dir: int = 0,
        n_obstacles: int = 4,
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
        if n_obstacles <= size / 2 + 1:
            self.n_obstacles = int(n_obstacles)
        else:
            self.n_obstacles = int(size / 2)

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        keys = jax.random.split(key, 3 + self.n_obstacles)
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, w - 2, h - 2, GOAL_CELL)

        if self.agent_start_pos is not None:
            pos = jnp.asarray(self.agent_start_pos, jnp.int32)
            direction = jnp.asarray(self.agent_start_dir, jnp.int32)
        else:
            pos = place_obj_pos(keys[0], grid)
            direction = rand_dir(keys[1])

        obstacles = []
        for i in range(self.n_obstacles):
            opos = place_obj_pos(keys[2 + i], grid, agent_pos=pos)
            grid = g.set_cell(grid, opos[0], opos[1], BALL_CELL)
            obstacles.append(opos)
        obstacles = jnp.stack(obstacles) if obstacles else jnp.zeros((0, 2), jnp.int32)

        return new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=keys[-1],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
            extra={
                "obstacles": obstacles,
                "front_not_clear": jnp.asarray(False),
            },
        )

    def _pre_step(self, key: jax.Array, state: EnvState, action) -> EnvState:
        from minigrid_tpu.core.constants import cell_type

        _DX = jnp.array([1, 0, -1, 0], jnp.int32)
        _DY = jnp.array([0, 1, 0, -1], jnp.int32)
        w, h = self.width, self.height
        # "not clear" check happens BEFORE obstacles move (reference :141-143).
        fx = jnp.clip(state.agent_x + _DX[state.agent_dir], 0, w - 1)
        fy = jnp.clip(state.agent_y + _DY[state.agent_dir], 0, h - 1)
        ft = cell_type(g.get_cell(state.grid, fx, fy))
        not_clear = (ft != OBJ_EMPTY) & (ft != OBJ_GOAL)

        grid = state.grid
        obstacles = state.extra["obstacles"]
        keys = jax.random.split(key, max(self.n_obstacles, 1))
        for i in range(self.n_obstacles):
            opos = obstacles[i]
            m = g.free_mask(grid, state.agent_pos) & neighbor_mask(w, h, opos)
            feasible = m.any()
            new_pos = sample_mask_cell(keys[i], m)
            new_pos = jnp.where(feasible, new_pos, opos)
            grid = g.set_cell(grid, opos[0], opos[1], EMPTY_CELL)
            grid = g.set_cell(grid, new_pos[0], new_pos[1], BALL_CELL)
            obstacles = obstacles.at[i].set(new_pos)

        return state.replace(
            grid=grid,
            extra={"obstacles": obstacles, "front_not_clear": not_clear},
        )

    def _map_action(self, action):
        # Actions outside the 3-action space act as 'left' (reference :137-139).
        a = jnp.asarray(action, jnp.int32)
        return jnp.where(a >= 3, 0, a)

    def _post_step(self, prev_state, state, action, reward):
        collided = (jnp.asarray(action, jnp.int32) == 2) & state.extra["front_not_clear"]
        reward = jnp.where(collided, -1.0, reward)
        terminated = state.terminated | collided
        return state.replace(terminated=terminated), reward

    def mission_text(self, mission=None) -> str:
        return "get to the green goal square"

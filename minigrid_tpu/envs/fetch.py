"""Fetch (reference: minigrid/envs/fetch.py:10-176)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import OBJ_BALL, OBJ_KEY, SORTED_COLOR_IDX, carry_color, carry_type, cell
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx

# Five mission syntax variants (reference: minigrid/envs/fetch.py:78-84,149-159).
_SYNTAX = ["get a", "go get a", "fetch a", "go fetch a", "you must fetch a"]
_MISSIONS = [
    register_mission(s + " {0} {1}", ("color", "type")) for s in _SYNTAX
]
_MISSION_ID_TABLE = jnp.asarray(_MISSIONS, jnp.int32)


class FetchEnv(MiniGridEnv):
    """N random keys/balls; picking up the target ends the episode with
    reward, picking up anything else ends it with 0
    (reference: minigrid/envs/fetch.py:108-176)."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(self, size: int = 8, numObjs: int = 3, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 5 * size**2
        super().__init__(
            width=size,
            height=size,
            max_steps=max_steps,
            see_through_walls=True,
            **kwargs,
        )
        self.num_objs = int(numObjs)

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        n = self.num_objs
        keys = jax.random.split(key, 3 * n + 5)
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)

        types = jnp.zeros((n,), jnp.int32)
        colors = jnp.zeros((n,), jnp.int32)
        for i in range(n):
            # Independent draws, duplicates allowed (reference :120-136).
            t = jnp.where(randint(keys[3 * i], 0, 2) == 0, OBJ_KEY, OBJ_BALL)
            c = jnp.asarray(SORTED_COLOR_IDX)[randint(keys[3 * i + 1], 0, 6)]
            pos = place_obj_pos(keys[3 * i + 2], grid)
            grid = g.set_cell(grid, pos[0], pos[1], cell(t, c))
            types = types.at[i].set(t)
            colors = colors.at[i].set(c)

        agent_pos = place_obj_pos(keys[-4], grid)
        agent_dir = rand_dir(keys[-3])

        target_idx = randint(keys[-2], 0, n)
        t_type = types[target_idx].astype(jnp.int32)
        t_color = colors[target_idx].astype(jnp.int32)
        syntax = randint(keys[-1], 0, 5)
        mission = mission_vec(_MISSION_ID_TABLE[syntax], t_color, t_type)

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=jax.random.fold_in(key, 1),
            max_steps=self.max_steps,
            mission=mission,
            extra={"target_type": t_type, "target_color": t_color},
        )

    def _post_step(self, prev_state, state, action, reward):
        carrying = carry_type(state.carrying) != 0
        match = (
            (carry_type(state.carrying).astype(jnp.int32) == state.extra["target_type"])
            & (carry_color(state.carrying).astype(jnp.int32) == state.extra["target_color"])
        )
        reward = jnp.where(carrying & match, success_reward(state), jnp.where(carrying, 0.0, reward))
        terminated = state.terminated | carrying
        return state.replace(terminated=terminated), reward


class _FetchFusedExt(fx.FusedExt):
    """Block twin of FetchEnv._post_step: any pickup ends the episode,
    rewarded only if (type, color) matches the commanded target."""

    n_scalars = 2

    def pack_extra(self, env, extra):
        scal = jnp.stack(
            [extra["target_type"], extra["target_color"]], axis=-1
        ).astype(jnp.int32)
        return scal, None

    def unpack_extra(self, env, scal, planes):
        return {"target_type": scal[..., 0], "target_color": scal[..., 1]}

    def post_step(self, ctx):
        carry = ctx.sc[fx.ROW_CARRY]
        carrying = fx.carry_type(carry) != 0
        match = (fx.carry_type(carry) == ctx.scal[0]) & (
            fx.carry_color(carry) == ctx.scal[1]
        )
        reward = jnp.where(
            carrying & match,
            ctx.success_reward(),
            jnp.where(carrying, 0.0, ctx.reward),
        )
        return carrying, reward, ctx.scal, ctx.planes


FetchEnv.fused_ext = _FetchFusedExt()

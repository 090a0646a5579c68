"""PutNear (reference: minigrid/envs/putnear.py:10-200)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import DIR_TO_VEC, carry_color, carry_type, cell
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx
from minigrid_tpu.envs.gotoobject import _COMBO_COLOR, _COMBO_TYPE

_MISSION = register_mission(
    "put the {0} {1} near the {2} {3}", ("color", "type", "color", "type")
)


class PutNearEnv(MiniGridEnv):
    """N distinct objects, none generated adjacent to another; pick up the
    move object and drop it next to the target
    (reference: minigrid/envs/putnear.py:103-200)."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(self, size: int = 6, numObjs: int = 2, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 5 * size
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
        keys = jax.random.split(key, n + 6)
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)

        combo = jax.random.permutation(keys[0], 18)[:n]
        types = jnp.asarray(_COMBO_TYPE)[combo]
        colors = jnp.asarray(_COMBO_COLOR)[combo]
        positions = jnp.zeros((n, 2), jnp.int32)
        near_existing = jnp.zeros((w, h), bool)
        xs, ys = g.coord_grids(w, h)
        for i in range(n):
            # reject_fn: not within chebyshev distance 1 of a placed object
            # (reference :118-124).
            pos = place_obj_pos(keys[1 + i], grid, reject=near_existing)
            grid = g.set_cell(grid, pos[0], pos[1], cell(types[i], colors[i]))
            positions = positions.at[i].set(pos)
            near_existing = near_existing | (
                (jnp.abs(xs - pos[0]) <= 1) & (jnp.abs(ys - pos[1]) <= 1)
            )

        agent_pos = place_obj_pos(keys[-5], grid)
        agent_dir = rand_dir(keys[-4])

        move_idx = randint(keys[-3], 0, n)
        # Target: uniform over the other indices (reference :162-165).
        t_off = randint(keys[-2], 1, n)
        target_idx = (move_idx + t_off) % n
        m_type = types[move_idx].astype(jnp.int32)
        m_color = colors[move_idx].astype(jnp.int32)
        t_type = types[target_idx].astype(jnp.int32)
        t_color = colors[target_idx].astype(jnp.int32)

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=keys[-1],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION, m_color, m_type, t_color, t_type),
            extra={
                "move_type": m_type,
                "move_color": m_color,
                "target_pos": positions[target_idx],
            },
        )

    def _post_step(self, prev_state, state, action, reward):
        a = jnp.asarray(action, jnp.int32)
        carrying = carry_type(state.carrying) != 0
        wrong = carrying & (
            (carry_type(state.carrying).astype(jnp.int32) != state.extra["move_type"])
            | (carry_color(state.carrying).astype(jnp.int32) != state.extra["move_color"])
        )
        wrong_pickup = (a == Actions.pickup) & wrong

        pre_carrying = carry_type(prev_state.carrying) != 0
        dropped = pre_carrying & ~carrying
        fwd = state.agent_pos + DIR_TO_VEC[state.agent_dir]
        tx, ty = state.extra["target_pos"][0], state.extra["target_pos"][1]
        near_target = (jnp.abs(fwd[0] - tx) <= 1) & (jnp.abs(fwd[1] - ty) <= 1)
        drop_attempt = (a == Actions.drop) & pre_carrying

        reward = jnp.where(
            drop_attempt & dropped & near_target, success_reward(state), reward
        )
        terminated = state.terminated | wrong_pickup | drop_attempt
        return state.replace(terminated=terminated), reward


class _PutNearFusedExt(fx.FusedExt):
    """Block twin of PutNearEnv._post_step: wrong pickups and any drop
    attempt terminate; a drop landing chebyshev-adjacent to the target
    succeeds (front cell from the POST pose, unclipped, as in the host hook)."""

    n_scalars = 4

    def pack_extra(self, env, extra):
        mt = extra["move_type"].astype(jnp.int32)[..., None]
        mc = extra["move_color"].astype(jnp.int32)[..., None]
        return jnp.concatenate(
            [mt, mc, jnp.asarray(extra["target_pos"], jnp.int32)], axis=-1
        ), None

    def unpack_extra(self, env, scal, planes):
        return {
            "move_type": scal[..., 0],
            "move_color": scal[..., 1],
            "target_pos": scal[..., 2:4],
        }

    def post_step(self, ctx):
        a = ctx.action
        carry = ctx.sc[fx.ROW_CARRY]
        carrying = fx.carry_type(carry) != 0
        wrong = carrying & (
            (fx.carry_type(carry) != ctx.scal[0])
            | (fx.carry_color(carry) != ctx.scal[1])
        )
        wrong_pickup = (a == Actions.pickup) & wrong

        pre_carrying = fx.carry_type(ctx.sc_prev[fx.ROW_CARRY]) != 0
        dropped = pre_carrying & ~carrying
        dx, dy = fx.dir_vec(ctx.sc[fx.ROW_DIR])
        fxx = ctx.sc[fx.ROW_AX] + dx
        fyy = ctx.sc[fx.ROW_AY] + dy
        near_target = (jnp.abs(fxx - ctx.scal[2]) <= 1) & (
            jnp.abs(fyy - ctx.scal[3]) <= 1
        )
        drop_attempt = (a == Actions.drop) & pre_carrying
        reward = jnp.where(
            drop_attempt & dropped & near_target, ctx.success_reward(), ctx.reward
        )
        return wrong_pickup | drop_attempt, reward, ctx.scal, ctx.planes


PutNearEnv.fused_ext = _PutNearFusedExt()

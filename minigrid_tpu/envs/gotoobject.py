"""GoToObject (reference: minigrid/envs/gotoobject.py:66-160)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import OBJ_BALL, OBJ_BOX, OBJ_KEY, SORTED_COLOR_IDX, cell
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx

_MISSION = register_mission("go to the {0} {1}", ("color", "type"))

# All (type, color) combinations in the reference's draw order semantics:
# distinct pairs sampled uniformly (rejection loop reference :107-113 ==
# uniform prefix of a permutation over the 18 combos).
_TYPES = np.array([OBJ_KEY, OBJ_BALL, OBJ_BOX], np.int32)
_COMBO_TYPE = np.repeat(_TYPES, 6)
_COMBO_COLOR = np.tile(np.asarray(SORTED_COLOR_IDX, np.int32), 3)


class GoToObjectEnv(MiniGridEnv):
    """N distinct random objects; `done` next to the target rewards, toggle
    terminates (reference: minigrid/envs/gotoobject.py:94-160)."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(self, size: int = 6, numObjs: int = 2, max_steps: int | None = None, **kwargs):
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
        keys = jax.random.split(key, n + 5)
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)

        combo = jax.random.permutation(keys[0], 18)[:n]
        types = jnp.asarray(_COMBO_TYPE)[combo]
        colors = jnp.asarray(_COMBO_COLOR)[combo]
        positions = jnp.zeros((n, 2), jnp.int32)
        for i in range(n):
            pos = place_obj_pos(keys[1 + i], grid)
            grid = g.set_cell(grid, pos[0], pos[1], cell(types[i], colors[i]))
            positions = positions.at[i].set(pos)

        agent_pos = place_obj_pos(keys[-3], grid)
        agent_dir = rand_dir(keys[-2])

        target = randint(keys[-1], 0, n)
        t_pos = positions[target]
        t_type = types[target].astype(jnp.int32)
        t_color = colors[target].astype(jnp.int32)

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=jax.random.fold_in(key, 1),
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION, t_color, t_type),
            extra={"target_pos": t_pos},
        )

    def _post_step(self, prev_state, state, action, reward):
        a = jnp.asarray(action, jnp.int32)
        ax, ay = state.agent_pos[0], state.agent_pos[1]
        tx, ty = state.extra["target_pos"][0], state.extra["target_pos"][1]
        next_to = ((ax == tx) & (jnp.abs(ay - ty) == 1)) | (
            (ay == ty) & (jnp.abs(ax - tx) == 1)
        )
        is_done = a == Actions.done
        reward = jnp.where(is_done & next_to, success_reward(state), reward)
        terminated = state.terminated | (a == Actions.toggle) | is_done
        return state.replace(terminated=terminated), reward


class GoToTargetFusedExt(fx.FusedExt):
    """Block twin of the GoToObject/GoToDoor _post_step: done next to the
    target succeeds; toggle or done terminates (shared by gotodoor.py)."""

    n_scalars = 2

    def pack_extra(self, env, extra):
        return jnp.asarray(extra["target_pos"], jnp.int32), None

    def unpack_extra(self, env, scal, planes):
        return {"target_pos": scal}

    def post_step(self, ctx):
        ax, ay = ctx.sc[fx.ROW_AX], ctx.sc[fx.ROW_AY]
        tx, ty = ctx.scal[0], ctx.scal[1]
        next_to = ((ax == tx) & (jnp.abs(ay - ty) == 1)) | (
            (ay == ty) & (jnp.abs(ax - tx) == 1)
        )
        is_done = ctx.action == Actions.done
        reward = jnp.where(is_done & next_to, ctx.success_reward(), ctx.reward)
        term = (ctx.action == Actions.toggle) | is_done
        return term, reward, ctx.scal, ctx.planes


GoToObjectEnv.fused_ext = GoToTargetFusedExt()

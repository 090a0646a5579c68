"""Empty room (reference: minigrid/envs/empty.py:9-114)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import GOAL_CELL, OBJ_EMPTY
from minigrid_tpu.ops import fused_ext as fx
from minigrid_tpu.ops.prng import uniform_index
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("get to the green goal square")
_MISSION_VEC = np.asarray(mission_vec(_MISSION))


class EmptyEnv(MiniGridEnv):
    """Walled empty room; goal in the bottom-right corner; fixed or random
    agent start (reference: minigrid/envs/empty.py:97-114)."""

    def __init__(
        self,
        size: int = 8,
        agent_start_pos: tuple[int, int] | None = (1, 1),
        agent_start_dir: int = 0,
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
        # With a fixed start the level is key-independent — see
        # core/env.py deterministic_generation.  With a RANDOM start the
        # level is one uniform placement over a constant scaffold, so the
        # fused kernels regenerate it in-kernel on every reset
        # (_EmptyRandomResetExt below) — exact iid resets with no cache.
        self.deterministic_generation = agent_start_pos is not None
        if agent_start_pos is None:
            self.fused_ext = _EmptyRandomResetExt()

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, w - 2, h - 2, GOAL_CELL)

        k_pos, k_dir, k_carry = jax.random.split(key, 3)
        if self.agent_start_pos is not None:
            pos = jnp.asarray(self.agent_start_pos, jnp.int32)
            direction = jnp.asarray(self.agent_start_dir, jnp.int32)
        else:
            pos = place_obj_pos(k_pos, grid)
            direction = rand_dir(k_dir)

        return new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "get to the green goal square"


class _EmptyRandomResetExt(fx.FusedExt):
    """Counter-reset twin for random-start Empty (ops/fused_ext.FusedExt):
    identity step hooks, in-kernel fresh-episode generation — the level is
    the constant walls+goal scaffold plus one uniform agent placement over
    empty cells (reference place_agent rejection rule,
    minigrid/minigrid_env.py:313-337) and a uniform direction."""

    covers_reset = True

    def reset_block(self, env, W, H, seed0, seed1, ep_idx):
        S = jnp.asarray(seed0).shape
        WH = W * H
        e0, e1 = fx.episode_seed(seed0, seed1, ep_idx)
        b0, b1 = fx.place_draw(e0, e1, 0)
        g = fx.walled_plane(W, H, S, [(W - 2, H - 2, GOAL_CELL)])
        zero = jnp.zeros(S, jnp.int32)
        free = (g & 0xFF) == OBJ_EMPTY
        cnt = jnp.sum(free.astype(jnp.int32), axis=0)
        t = uniform_index(b0, jnp.maximum(cnt, 1))
        alin = fx.nth_true_index(free, t, zero)
        sc = {
            fx.ROW_AX: alin // H,
            fx.ROW_AY: alin % H,
            fx.ROW_DIR: uniform_index(b1, zero + 4),
            fx.ROW_CARRY: zero,
            fx.ROW_STEP: zero,
            fx.ROW_MAX: zero + jnp.int32(env.max_steps),
            fx.ROW_TERM: zero,
            fx.ROW_TRUNC: zero,
        }
        c = jnp.zeros((WH,) + tuple(S), jnp.int32)
        mis = fx.scalar_rows(_MISSION_VEC, S)
        return g, c, sc, mis, (), ()


# Kernel specialization (core/env.py flags): Empty grids hold only
# wall/goal cells and the mission is a family constant.
EmptyEnv.fused_no_objects = True
EmptyEnv.fused_static_mission = True

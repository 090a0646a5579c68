"""Crossing mazes (reference: minigrid/envs/crossing.py:13-184).

N lava/wall "rivers" on even rows/columns, with one opening per river sampled
along a random room-to-room path so the goal stays reachable.  The reference
shuffles Python lists and walks rooms imperatively; here the same distribution
is produced with fixed-shape permutations and a statically unrolled path walk
(num_crossings is static per env id).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import EMPTY_CELL, GOAL_CELL, LAVA_CELL, WALL_CELL
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.state import EnvState, new_state

_MISSION_LAVA = register_mission("avoid the lava and get to the green goal square")
_MISSION_WALL = register_mission("find the opening and get to the green goal square")


def _dyn_randint(key: jax.Array, lo, hi) -> jnp.ndarray:
    """Uniform int in [lo, hi) with traced bounds."""
    u = jax.random.uniform(key)
    span = (hi - lo).astype(jnp.float32)
    return (lo + jnp.floor(u * span).astype(jnp.int32)).astype(jnp.int32)


class CrossingEnv(MiniGridEnv):
    """Reference: minigrid/envs/crossing.py:122-184."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(
        self,
        size: int = 9,
        num_crossings: int = 1,
        obstacle_type: str = "lava",
        max_steps: int | None = None,
        **kwargs,
    ):
        assert size % 2 == 1
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(
            width=size,
            height=size,
            max_steps=max_steps,
            see_through_walls=False,
            **kwargs,
        )
        assert obstacle_type in ("lava", "wall")
        self.obstacle_type = obstacle_type
        self.num_crossings = int(num_crossings)

    # Flat-pool reset cache: this family's generator (permutation + sort +
    # dynamic-bound randints) lowers 10x faster as one flat vmap — 69.4 ->
    # 6.8 ms for the 65536x2 cache (scanned marginal, v5e); see
    # MiniGridEnv.flat_reset_pool.
    flat_reset_pool = True

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        k_sel, k_path, k_open, k_carry = jax.random.split(key, 4)
        kc = self.num_crossings
        obstacle = LAVA_CELL if self.obstacle_type == "lava" else WALL_CELL
        big = jnp.int32(10**6)

        grid = g.wall_rect(g.empty_grid(w, h), 0, 0, w, h)
        grid = g.set_cell(grid, w - 2, h - 2, GOAL_CELL)

        # Candidate rivers: vertical at x in {2,4,...}, horizontal at y in
        # {2,4,...} (reference :142-143; the reference's v/h naming is
        # swapped relative to geometry — semantics preserved).
        v_cand = np.arange(2, h - 2, 2, dtype=np.int32)
        h_cand = np.arange(2, w - 2, 2, dtype=np.int32)
        cand_pos = jnp.asarray(np.concatenate([v_cand, h_cand]))
        cand_is_v = jnp.asarray(
            np.concatenate(
                [np.ones_like(v_cand, bool), np.zeros_like(h_cand, bool)]
            )
        )
        perm = jax.random.permutation(k_sel, cand_pos.shape[0])
        sel = perm[:kc]
        sel_pos, sel_is_v = cand_pos[sel], cand_is_v[sel]

        # Sorted per-type positions, padded with +inf sentinel (reference :146-147).
        rv = jnp.sort(jnp.where(sel_is_v, sel_pos, big))
        rh = jnp.sort(jnp.where(~sel_is_v, sel_pos, big))
        n_v = sel_is_v.sum()
        n_h = kc - n_v

        # Draw the rivers (reference :148-153).
        for t in range(kc):
            vmask = g.vert_wall_mask(w, h, sel_pos[t], 1, h - 2)
            hmask = g.horz_wall_mask(w, h, 1, sel_pos[t], w - 2)
            grid = g.put(grid, jnp.where(sel_is_v[t], vmask, hmask), obstacle)

        # Room-limit tables: [0] + rivers + [edge] (reference :160-161).
        def limits(rs, n, edge):
            i = jnp.arange(kc + 2)
            inner = rs[jnp.clip(i - 1, 0, kc - 1)] if kc > 0 else jnp.zeros(kc + 2, jnp.int32)
            return jnp.where(i == 0, 0, jnp.where(i <= n, inner, edge)).astype(jnp.int32)

        lv = limits(rv, n_v, h - 1)
        lh = limits(rh, n_h, w - 1)

        # Path: n_v horizontal moves then n_h vertical, shuffled (reference :156-157).
        is_h_move = jax.random.permutation(k_path, jnp.arange(kc) < n_v)

        # Walk rooms, opening one cell per crossed river (reference :162-178).
        room_i = jnp.int32(0)
        room_j = jnp.int32(0)
        open_keys = jax.random.split(k_open, max(kc, 1))
        for t in range(kc):
            hmove = is_h_move[t]
            x_h = lv[room_i + 1]
            y_h = _dyn_randint(open_keys[t], lh[room_j] + 1, lh[room_j + 1])
            x_v = _dyn_randint(open_keys[t], lv[room_i] + 1, lv[room_i + 1])
            y_v = lh[room_j + 1]
            x = jnp.where(hmove, x_h, x_v)
            y = jnp.where(hmove, y_h, y_v)
            grid = g.set_cell(grid, x, y, EMPTY_CELL)
            room_i = room_i + hmove.astype(jnp.int32)
            room_j = room_j + (~hmove).astype(jnp.int32)

        mission = _MISSION_LAVA if self.obstacle_type == "lava" else _MISSION_WALL
        return new_state(
            grid=grid,
            agent_pos=jnp.asarray((1, 1), jnp.int32),
            agent_dir=0,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(mission),
        )

    def mission_text(self, mission=None) -> str:
        if self.obstacle_type == "lava":
            return "avoid the lava and get to the green goal square"
        return "find the opening and get to the green goal square"


# Kernel specialization (core/env.py flags): Crossing grids hold only
# wall/lava/goal cells and the mission depends only on the obstacle type.
CrossingEnv.fused_no_objects = True
CrossingEnv.fused_static_mission = True

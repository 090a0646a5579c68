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
from minigrid_tpu.ops import fused_ext as fx
from minigrid_tpu.ops.prng import uniform_index

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


class _CrossingResetExt(fx.FusedExt):
    """Counter-reset twin of the Crossing generator (covers_reset): the
    fused kernels regenerate a fresh maze on every episode end — river
    selection (ordered sample without replacement from the candidate set),
    the kc river strips, the shuffled room path and one opening per crossed
    river — from the counter stream, with identical level distribution to
    ``_generate`` (reference minigrid/envs/crossing.py:134-178; enforced by
    tests/test_counter_reset.py).  Identity step hooks (Crossing has
    default-hook dynamics)."""

    covers_reset = True

    @staticmethod
    def _pick(scalars, index, zero):
        """scalars[index] per env, unrolled selects (no gathers in-kernel)."""
        out = zero
        for i, v in enumerate(scalars):
            out = jnp.where(index == i, v, out)
        return out

    def reset_block(self, env, W, H, seed0, seed1, ep_idx):
        S = jnp.asarray(seed0).shape
        WH = W * H
        kc = env.num_crossings
        obstacle = int(LAVA_CELL if env.obstacle_type == "lava" else WALL_CELL)
        e0, e1 = fx.episode_seed(seed0, seed1, ep_idx)
        n_words = 3 * kc
        words = []
        for j in range((n_words + 1) // 2):
            words.extend(fx.place_draw(e0, e1, j))
        sel_bits = words[:kc]
        path_bits = words[kc : 2 * kc]
        open_bits = words[2 * kc : 3 * kc]

        zero = jnp.zeros(S, jnp.int32)
        big = jnp.int32(10**6)
        v_cand = list(range(2, H - 2, 2))
        h_cand = list(range(2, W - 2, 2))
        cand = v_cand + h_cand
        C = len(cand)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (C,) + tuple(S), 0)

        # Ordered sample of kc distinct candidates == the first kc entries of
        # a uniform permutation (reference :144-145's perm[:kc]).
        chosen = jnp.zeros((C,) + tuple(S), bool)
        pos_t, isv_t = [], []
        for t in range(kc):
            r = uniform_index(sel_bits[t], jnp.full(S, C - t, jnp.int32))
            j = fx.nth_true_index(~chosen, r, zero)
            chosen = chosen | (iota_c == j[None])
            pos_t.append(self._pick([jnp.int32(c) for c in cand], j, zero))
            isv_t.append(j < len(v_cand))

        # Sorted per-type positions with +big sentinels (reference :146-147).
        def sort_vals(vals):
            vals = list(vals)
            for a in range(len(vals)):
                for b in range(len(vals) - 1 - a):
                    lo = jnp.minimum(vals[b], vals[b + 1])
                    hi = jnp.maximum(vals[b], vals[b + 1])
                    vals[b], vals[b + 1] = lo, hi
            return vals

        rv = sort_vals(jnp.where(isv_t[t], pos_t[t], big) for t in range(kc))
        rh = sort_vals(jnp.where(isv_t[t], big, pos_t[t]) for t in range(kc))
        n_v = zero
        for t in range(kc):
            n_v = n_v + isv_t[t].astype(jnp.int32)

        # Base grid + rivers (reference :148-153).
        g_plane = fx.walled_plane(W, H, S, [(W - 2, H - 2, GOAL_CELL)])
        idx = jax.lax.broadcasted_iota(jnp.int32, (WH,) + tuple(S), 0)
        xs, ys = idx // H, idx % H
        for t in range(kc):
            p = pos_t[t][None]
            isv = isv_t[t][None]
            vmask = (xs == p) & (ys >= 1) & (ys <= H - 2)
            hmask = (ys == p) & (xs >= 1) & (xs <= W - 2)
            # Logical blend, not a bool-valued select: Mosaic rejects
            # select ops with i1 results ("unsupported target bitwidth for
            # truncation") on the real chip.
            m = (isv & vmask) | (~isv & hmask)
            g_plane = jnp.where(m, jnp.int32(obstacle), g_plane)

        # Room-limit tables [0] + rivers + [edge] (reference :160-161).
        def limits(rs, n, edge):
            out = [zero]
            for i in range(1, kc + 1):
                out.append(jnp.where(i <= n, rs[i - 1], jnp.int32(edge)))
            out.append(zero + jnp.int32(edge))
            return out

        lv = limits(rv, n_v, H - 1)
        lh = limits(rh, kc - n_v, W - 1)  # n_h = kc - n_v

        # Shuffled path: n_v horizontal moves among kc (reference :156-157) —
        # sequential multiset-permutation draws.
        remaining_h = n_v
        room_i, room_j = zero, zero
        for t in range(kc):
            r = uniform_index(path_bits[t], jnp.full(S, kc - t, jnp.int32))
            hmove = r < remaining_h
            remaining_h = remaining_h - hmove.astype(jnp.int32)
            x_h = self._pick(lv, room_i + 1, zero)
            lo_h = self._pick(lh, room_j, zero) + 1
            hi_h = self._pick(lh, room_j + 1, zero)
            y_h = lo_h + uniform_index(
                open_bits[t], jnp.maximum(hi_h - lo_h, 1)
            )
            lo_v = self._pick(lv, room_i, zero) + 1
            hi_v = self._pick(lv, room_i + 1, zero)
            x_v = lo_v + uniform_index(
                open_bits[t], jnp.maximum(hi_v - lo_v, 1)
            )
            y_v = self._pick(lh, room_j + 1, zero)
            x = jnp.where(hmove, x_h, x_v)
            y = jnp.where(hmove, y_h, y_v)
            g_plane = jnp.where(
                idx == (x * H + y)[None], jnp.int32(int(EMPTY_CELL)), g_plane
            )
            room_i = room_i + hmove.astype(jnp.int32)
            room_j = room_j + (~hmove).astype(jnp.int32)

        sc = {
            fx.ROW_AX: zero + 1,
            fx.ROW_AY: zero + 1,
            fx.ROW_DIR: zero,
            fx.ROW_CARRY: zero,
            fx.ROW_STEP: zero,
            fx.ROW_MAX: zero + jnp.int32(env.max_steps),
            fx.ROW_TERM: zero,
            fx.ROW_TRUNC: zero,
        }
        c = jnp.zeros((WH,) + tuple(S), jnp.int32)
        mis = fx.scalar_rows(
            _MISSION_VEC_LAVA if env.obstacle_type == "lava" else _MISSION_VEC_WALL,
            S,
        )
        return g_plane, c, sc, mis, (), ()


_MISSION_VEC_LAVA = np.asarray(mission_vec(_MISSION_LAVA))
_MISSION_VEC_WALL = np.asarray(mission_vec(_MISSION_WALL))

# Kernel specialization (core/env.py flags): Crossing grids hold only
# wall/lava/goal cells and the mission depends only on the obstacle type.
CrossingEnv.fused_no_objects = True
CrossingEnv.fused_static_mission = True
CrossingEnv.fused_ext = _CrossingResetExt()

"""Dynamic-Obstacles (reference: minigrid/envs/dynamicobstacles.py:13-167)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx
from minigrid_tpu.ops.prng import threefry2x32, uniform_index

_MISSION = register_mission("get to the green goal square")
_MISSION_VEC = np.asarray(mission_vec(_MISSION))

BALL_CELL = cell(OBJ_BALL, COLOR_BLUE)

# Domain-separation tag for the obstacle-walk stream: the walk seed is
# derived from the episode rng by one threefry application with this fixed
# counter, so walk draws can never collide with the jax.random split chain
# (which hashes the same key with small counters).
_WALK_TAG = (0x6F627374, 0x77616C6B)  # "obst", "walk"


def walk_obstacles(plane, agent_lin, obs_xy, seed0, seed1, step, *, n, W, H):
    """One obstacle-walk round over a packed grid plane, in index order (the
    reference's sequential ``place_obj`` loop, dynamicobstacles.py:146-156:
    each obstacle re-samples uniformly among free cells of its 3x3
    neighborhood; an obstacle with no free neighbor stays put, mirroring the
    swallowed placement failure).

    Shape-polymorphic over the env axes ``*S``: ``plane`` int32[W*H, *S],
    ``agent_lin``/``seed0``/``seed1``/``step`` int32[*S], ``obs_xy`` a list
    of ``n`` (ox, oy) int32[*S] pairs.  With ``*S = ()`` this is the XLA
    ``_pre_step`` path; with ``*S = (E2, 8, 128)`` it is the fused-kernel
    block twin — the SAME trace, so fused-vs-XLA bit-exactness is by
    construction.  Randomness is the counter-based stream
    ``threefry2x32(seed, (step, j))`` (ops/prng.py); one evaluation yields
    two words, covering obstacles 2j and 2j+1.
    """
    WH = W * H
    idx = jax.lax.broadcasted_iota(jnp.int32, plane.shape, 0)
    xs, ys = idx // H, idx % H
    out_xy = []
    bits_pair = None
    for i in range(n):
        if i % 2 == 0:
            bits_pair = threefry2x32(seed0, seed1, step, jnp.int32(i // 2))
        bits = bits_pair[i % 2]
        ox, oy = obs_xy[i]
        olin = ox * H + oy
        free = ((plane & 0xFF) == OBJ_EMPTY) & (idx != agent_lin[None])
        nb = (
            (xs >= (ox - 1)[None])
            & (xs <= (ox + 1)[None])
            & (ys >= (oy - 1)[None])
            & (ys <= (oy + 1)[None])
        )
        m = free & nb
        mi = m.astype(jnp.int32)
        cnt = jnp.sum(mi, axis=0)
        target = uniform_index(bits, jnp.maximum(cnt, 1))
        # Select the target-th set cell with an unrolled running count over
        # the (small, leading) cell axis — Mosaic has no cumsum lowering.
        acc = jnp.zeros_like(cnt)
        nlin = jnp.zeros_like(cnt)
        for w in range(WH):
            hit = m[w] & (acc == target)
            nlin = jnp.where(hit, jnp.int32(w), nlin)
            acc = acc + mi[w]
        nlin = jnp.where(cnt > 0, nlin, olin)
        plane = jnp.where(idx == olin[None], jnp.int32(_EMPTY), plane)
        plane = jnp.where(idx == nlin[None], jnp.int32(_BALL), plane)
        out_xy.append((nlin // H, nlin % H))
    return plane, out_xy


_EMPTY = int(EMPTY_CELL)
_BALL = int(BALL_CELL)


class DynamicObstaclesEnv(MiniGridEnv):
    """Empty room with randomly walking ball obstacles; stepping into one
    (or any non-goal blocked cell) gives reward -1 and terminates
    (reference: minigrid/envs/dynamicobstacles.py:136-167).

    Obstacle positions live in ``state.extra["obstacles"]`` (int32[n, 2]);
    the walk randomness is the counter-based stream of :func:`walk_obstacles`
    seeded per episode (``extra["walk_seed"]``), NOT the jax.random split
    chain — so the fused kernel (which does not thread the chain) runs the
    identical stream.  Reference-exact in-step draws are host-mirrored by the
    parity path (compat/parity.py ParityRollout).
    """

    # XLA-path rollouts amortize generation through the per-chunk reset
    # cache (minigrid_tpu/parallel/vector.py); the fused kernels instead
    # regenerate fresh levels IN-KERNEL on every episode end (the ext's
    # covers_reset/reset_block below) — exact iid resets at this family's
    # high episode rate with no cache at all.
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
        # The ext's scalar count depends on n_obstacles, so it is attached
        # per instance (resolved at call time; the class is defined below).
        self.fused_ext = _DynamicObstaclesFusedExt(self.n_obstacles)

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

        rng = keys[-1]
        ws0, ws1 = threefry2x32(
            rng[0], rng[1], jnp.uint32(_WALK_TAG[0]), jnp.uint32(_WALK_TAG[1])
        )
        walk_seed = jax.lax.bitcast_convert_type(
            jnp.stack([ws0, ws1]), jnp.int32
        )

        return new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=rng,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
            extra={
                "obstacles": obstacles,
                "front_not_clear": jnp.asarray(False),
                "walk_seed": walk_seed,
            },
        )

    def _pre_step(self, key: jax.Array, state: EnvState, action) -> EnvState:
        from minigrid_tpu.core.constants import cell_type

        _DX = jnp.array([1, 0, -1, 0], jnp.int32)
        _DY = jnp.array([0, 1, 0, -1], jnp.int32)
        w, h = self.width, self.height
        # "not clear" check happens BEFORE obstacles move (reference :141-143).
        fx_ = jnp.clip(state.agent_x + _DX[state.agent_dir], 0, w - 1)
        fy_ = jnp.clip(state.agent_y + _DY[state.agent_dir], 0, h - 1)
        ft = cell_type(g.get_cell(state.grid, fx_, fy_))
        not_clear = (ft != OBJ_EMPTY) & (ft != OBJ_GOAL)

        obstacles = state.extra["obstacles"]
        seed = state.extra["walk_seed"]
        plane, new_xy = walk_obstacles(
            state.grid.reshape(w * h),
            state.agent_x * h + state.agent_y,
            [(obstacles[i, 0], obstacles[i, 1]) for i in range(self.n_obstacles)],
            seed[0],
            seed[1],
            state.step_count,
            n=self.n_obstacles,
            W=w,
            H=h,
        )
        new_obs = (
            jnp.stack([jnp.stack([x, y]) for x, y in new_xy])
            if new_xy
            else obstacles
        )
        return state.replace(
            grid=plane.reshape(w, h),
            extra={
                "obstacles": new_obs.astype(jnp.int32),
                "front_not_clear": not_clear,
                "walk_seed": seed,
            },
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


class _DynamicObstaclesFusedExt(fx.FusedExt):
    """Block twin of the Dynamic-Obstacles hooks: the pre-action obstacle
    walk (shared :func:`walk_obstacles` trace — bit-exact with the XLA path
    by construction), the >=3 -> left action remap, and the collision
    penalty.  Scalar layout: [ox0, oy0, ..., ox(n-1), oy(n-1),
    front_not_clear, walk_seed0, walk_seed1]."""

    covers_pre_step = True

    def __init__(self, n_obstacles: int):
        self.n = int(n_obstacles)
        self.n_scalars = 2 * self.n + 3

    def pack_extra(self, env, extra):
        obst = jnp.asarray(extra["obstacles"], jnp.int32)
        flat = obst.reshape(obst.shape[:-2] + (2 * self.n,))
        fnc = jnp.asarray(extra["front_not_clear"], jnp.int32)[..., None]
        seed = jnp.asarray(extra["walk_seed"], jnp.int32)
        return jnp.concatenate([flat, fnc, seed], axis=-1), None

    def unpack_extra(self, env, scal, planes):
        n = self.n
        return {
            "obstacles": scal[..., : 2 * n].reshape(scal.shape[:-1] + (n, 2)),
            "front_not_clear": scal[..., 2 * n] != 0,
            "walk_seed": scal[..., 2 * n + 1 : 2 * n + 3],
        }

    def map_action(self, env, a):
        return jnp.where(a >= 3, jnp.int32(0), a)

    def pre_step(self, env, W, H, g_plane, c, sc, scal, planes, action):
        n = self.n
        ax, ay, d = sc[fx.ROW_AX], sc[fx.ROW_AY], sc[fx.ROW_DIR]
        dx, dy = fx.dir_vec(d)
        fxp = jnp.clip(ax + dx, 0, W - 1)
        fyp = jnp.clip(ay + dy, 0, H - 1)
        flin = fxp * H + fyp
        idx = jax.lax.broadcasted_iota(jnp.int32, g_plane.shape, 0)
        fcell = jnp.sum(jnp.where(idx == flin[None], g_plane, 0), axis=0)
        ft = fcell & 0xFF
        not_clear = (ft != OBJ_EMPTY) & (ft != OBJ_GOAL)

        obs_xy = [(scal[2 * i], scal[2 * i + 1]) for i in range(n)]
        ws0, ws1 = scal[2 * n + 1], scal[2 * n + 2]
        g_plane, new_xy = walk_obstacles(
            g_plane,
            ax * H + ay,
            obs_xy,
            ws0,
            ws1,
            sc[fx.ROW_STEP],
            n=n,
            W=W,
            H=H,
        )
        new_scal = []
        for x, y in new_xy:
            new_scal += [x, y]
        new_scal += [not_clear.astype(jnp.int32), ws0, ws1]
        return g_plane, c, sc, tuple(new_scal), planes

    def post_step(self, ctx):
        collided = (ctx.action == 2) & (ctx.scal[2 * self.n] != 0)
        reward = jnp.where(collided, -1.0, ctx.reward)
        return collided, reward, ctx.scal, ctx.planes

    # Fresh-episode twin (covers_reset): the level is a constant scaffold
    # (border walls + corner goal) plus n sequential uniform placements over
    # free cells — exactly _generate's acceptance rule (place_obj_pos:
    # uniform over empty cells not under the agent, the reference's
    # place_obj rejection loop, minigrid/minigrid_env.py:339-364) — driven
    # from the counter stream so the kernel regenerates on EVERY reset: the
    # reference's fresh-level contract at any episode rate, no cache.
    covers_reset = True

    def reset_block(self, env, W, H, seed0, seed1, ep_idx):
        S = jnp.asarray(seed0).shape
        WH = W * H
        e0, e1 = fx.episode_seed(seed0, seed1, ep_idx)
        g = fx.walled_plane(W, H, S, [(W - 2, H - 2, GOAL_CELL)])
        idx = jax.lax.broadcasted_iota(jnp.int32, (WH,) + tuple(S), 0)

        draws = []  # one uniform word per draw, counter-indexed
        n_draw = (2 if env.agent_start_pos is None else 0) + self.n
        for j in range((n_draw + 1) // 2):
            draws.extend(fx.place_draw(e0, e1, j))
        draws = iter(draws)

        zero = jnp.zeros(S, jnp.int32)
        if env.agent_start_pos is not None:
            ax = zero + jnp.int32(env.agent_start_pos[0])
            ay = zero + jnp.int32(env.agent_start_pos[1])
            d = zero + jnp.int32(env.agent_start_dir)
        else:
            free = (g & 0xFF) == OBJ_EMPTY
            cnt = jnp.sum(free.astype(jnp.int32), axis=0)
            t = uniform_index(next(draws), jnp.maximum(cnt, 1))
            alin = fx.nth_true_index(free, t, zero)
            ax, ay = alin // H, alin % H
            d = uniform_index(next(draws), zero + 4)
        agent_lin = ax * H + ay

        scal = []
        for _ in range(self.n):
            free = ((g & 0xFF) == OBJ_EMPTY) & (idx != agent_lin[None])
            cnt = jnp.sum(free.astype(jnp.int32), axis=0)
            t = uniform_index(next(draws), jnp.maximum(cnt, 1))
            olin = fx.nth_true_index(free, t, zero)
            g = jnp.where(idx == olin[None], jnp.int32(_BALL), g)
            scal += [olin // H, olin % H]

        ws0, ws1 = threefry2x32(
            e0, e1, jnp.uint32(_WALK_TAG[0]), jnp.uint32(_WALK_TAG[1])
        )
        scal += [
            zero,  # front_not_clear
            jax.lax.bitcast_convert_type(ws0, jnp.int32),
            jax.lax.bitcast_convert_type(ws1, jnp.int32),
        ]

        sc = {
            fx.ROW_AX: ax,
            fx.ROW_AY: ay,
            fx.ROW_DIR: d,
            fx.ROW_CARRY: zero,
            fx.ROW_STEP: zero,
            fx.ROW_MAX: zero + jnp.int32(env.max_steps),
            fx.ROW_TERM: zero,
            fx.ROW_TRUNC: zero,
        }
        c = jnp.zeros((WH,) + tuple(S), jnp.int32)
        mis = fx.scalar_rows(_MISSION_VEC, S)
        return g, c, sc, mis, tuple(scal), ()


# Kernel specialization (core/env.py flags): the action remap clamps every
# action >= 3 to 'left', so pickup/drop/toggle never reach the core step —
# the obstacle walk rewrites the grid in the ext pre_step, which the
# fused_no_objects contract explicitly permits.  The mission is constant.
DynamicObstaclesEnv.fused_no_objects = True
DynamicObstaclesEnv.fused_static_mission = True

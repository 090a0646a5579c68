"""Whole-rollout fused transition kernel (Pallas, TPU).

One kernel program runs ``T`` environment steps for a block of envs with the
ENTIRE episode state resident in VMEM: packed grid, contains plane, agent
scalars, mission vector, and the auto-reset cache.  HBM is touched once per
block (state in, state out, the per-step action stream) instead of once per
step, and the step -> autoreset -> observation chain is computed in place —
the "keep each env's grid in VMEM across step->obs" design the XLA scan
cannot express (each scan iteration round-trips the carry through HBM and
materializes obs intermediates).

Semantics are exactly ``MiniGridEnv.step_cached`` (core/env.py:134-173) —
core transition (core/step.py, itself a port of the reference hot loop
minigrid/minigrid_env.py:525-650), auto-reset drawn from a pre-generated
cache of R fresh episodes, observation of the post-reset state — for
families with DEFAULT hooks (no ``_pre_step``/``_post_step``/``_map_action``
overrides, no ``extra`` state).  The in-episode RNG chain is NOT threaded
through the kernel: default-hook families never consume it, and the caller
re-keys the returned states (see ``fused_rollout``).

Layout
------
Envs live in the two TRAILING dims, always shaped ``(..., 8, 128)`` — one
full int32 VPU tile — so every per-env operation (including the per-env
"scalar" logic of the step rules and the occlusion flood) runs at 100% lane
utilization.  Structural axes (grid cell, view slot, cache slot) are LEADING
dims, where no tiling padding applies.  A block holds ``E2 * 1024`` envs.

The observation is consumed in-kernel as a packed checksum
(sum of visible packed cells, int32 wraparound) — the same full-rank
consumption contract as bench.py's obs-consumed metric: every element of
every observation feeds the output, so nothing can be dead-code-eliminated.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_FLOOR,
    OBJ_GOAL,
    OBJ_KEY,
    OBJ_LAVA,
    OBJ_WALL,
    STATE_LOCKED,
    STATE_OPEN,
    WALL_CELL,
)
from minigrid_tpu.ops import fused_ext as _fx
from minigrid_tpu.ops.fused_ext import FusedCtx

# Scalar-plane row indices (the per-env int32 state vector).
ROW_AX, ROW_AY, ROW_DIR, ROW_CARRY, ROW_STEP, ROW_MAX, ROW_TERM, ROW_TRUNC = range(8)
NUM_SC = 8
assert (_fx.ROW_AX, _fx.ROW_TRUNC) == (ROW_AX, ROW_TRUNC)

# Python-int wall cell (WALL_CELL is a device constant; kernels must not
# capture traced values).
_WALL = int(WALL_CELL)


def _dir_vec(d):
    """DIR_TO_VEC as predicated selects (no gather): 0:+x 1:+y 2:-x 3:-y."""
    one = jnp.int32(1)
    zero = jnp.int32(0)
    dx = jnp.where(d == 0, one, jnp.where(d == 2, -one, zero))
    dy = jnp.where(d == 1, one, jnp.where(d == 3, -one, zero))
    return dx, dy


def _can_overlap(t, s):
    return (
        (t == OBJ_EMPTY)
        | (t == OBJ_FLOOR)
        | (t == OBJ_GOAL)
        | (t == OBJ_LAVA)
        | ((t == OBJ_DOOR) & (s == STATE_OPEN))
    )


def _can_pickup(t):
    return (t == OBJ_KEY) | (t == OBJ_BALL) | (t == OBJ_BOX)


def _see_behind(t, s):
    return ~((t == OBJ_WALL) | ((t == OBJ_DOOR) & (s != STATE_OPEN)))


def _step_block(g, c, sc, action, *, W, H, no_objects=False):
    """One core_step over a block.  ``g``/``c``: int32[WH, *S]; ``sc``: dict of
    int32[*S] scalar planes; returns updated (g, c, sc, reward f32[*S]).

    Line-for-line port of core/step.py:48-158 into the block layout.
    ``no_objects`` (the family's ``fused_no_objects`` contract, core/env.py):
    no cell is pickup-able or toggle-able, so the interaction branch — the
    contains reduce, the grid/contains write-back, and the carry update — is
    statically dead and skipped.
    """
    WH = W * H
    S = action.shape
    ax, ay, d = sc[ROW_AX], sc[ROW_AY], sc[ROW_DIR]
    carry = sc[ROW_CARRY]
    step_count = sc[ROW_STEP] + 1
    max_steps = sc[ROW_MAX]

    dx, dy = _dir_vec(d)
    fx = jnp.clip(ax + dx, 0, W - 1)
    fy = jnp.clip(ay + dy, 0, H - 1)
    fidx = fx * H + fy

    cidx = jax.lax.broadcasted_iota(jnp.int32, (WH,) + S, 0)
    fmask = cidx == fidx[None]
    fcell = jnp.sum(jnp.where(fmask, g, 0), axis=0)
    ftype = fcell & 0xFF
    fcolor = (fcell >> 8) & 0xFF
    fstate = (fcell >> 16) & 0xFF

    is_left = action == 0
    is_right = action == 1
    is_fwd = action == 2
    is_pickup = action == 3
    is_drop = action == 4
    is_toggle = action == 5

    d = jnp.where(is_left, (d + 3) & 3, jnp.where(is_right, (d + 1) & 3, d))

    moves = is_fwd & _can_overlap(ftype, fstate)
    ax = jnp.where(moves, fx, ax)
    ay = jnp.where(moves, fy, ay)
    hit_goal = is_fwd & (ftype == OBJ_GOAL)
    hit_lava = is_fwd & (ftype == OBJ_LAVA)
    terminated = hit_goal | hit_lava
    reward = jnp.where(
        hit_goal,
        1.0 - 0.9 * (step_count.astype(jnp.float32) / max_steps.astype(jnp.float32)),
        0.0,
    )

    if no_objects:
        truncated = step_count >= max_steps
        out = dict(sc)
        out[ROW_AX], out[ROW_AY], out[ROW_DIR] = ax, ay, d
        out[ROW_STEP] = step_count
        out[ROW_TERM] = terminated.astype(jnp.int32)
        out[ROW_TRUNC] = truncated.astype(jnp.int32)
        aux = (fmask, fcell, fcell)  # nothing is ever written
        return g, c, out, reward, aux

    fcont = jnp.sum(jnp.where(fmask, c, 0), axis=0)
    hands_free = carry == 0
    do_pickup = is_pickup & _can_pickup(ftype) & hands_free & (ftype != OBJ_EMPTY)
    do_drop = is_drop & (ftype == OBJ_EMPTY) & ~hands_free
    is_door = ftype == OBJ_DOOR
    is_box = ftype == OBJ_BOX
    has_key = ((carry & 0xFF) == OBJ_KEY) & (((carry >> 8) & 0xFF) == fcolor)
    door_new_state = jnp.where(
        fstate == STATE_LOCKED,
        jnp.where(has_key, STATE_OPEN, STATE_LOCKED),
        jnp.where(fstate == STATE_OPEN, 1, 0),
    )
    do_toggle_door = is_toggle & is_door
    do_toggle_box = is_toggle & is_box

    drop_cell = carry & 0xFFFF
    door_cell = (fcell & 0xFFFF) | (door_new_state << 16)
    box_reveal = jnp.where(fcont == 0, jnp.int32(OBJ_EMPTY), fcont)
    new_fcell = fcell
    new_fcell = jnp.where(do_pickup, jnp.int32(OBJ_EMPTY), new_fcell)
    new_fcell = jnp.where(do_drop, drop_cell, new_fcell)
    new_fcell = jnp.where(do_toggle_door, door_cell, new_fcell)
    new_fcell = jnp.where(do_toggle_box, box_reveal, new_fcell)

    new_fcont = fcont
    new_fcont = jnp.where(do_pickup | do_toggle_box, 0, new_fcont)
    new_fcont = jnp.where(do_drop, (carry >> 16) & 0xFFFF, new_fcont)

    write = do_pickup | do_drop | do_toggle_door | do_toggle_box
    wmask = fmask & write[None]
    g = jnp.where(wmask, new_fcell[None], g)
    c = jnp.where(wmask, new_fcont[None], c)

    picked = ftype | (fcolor << 8) | (fcont << 16)
    carry = jnp.where(do_pickup, picked, carry)
    carry = jnp.where(do_drop, 0, carry)

    truncated = step_count >= max_steps

    out = dict(sc)
    out[ROW_AX], out[ROW_AY], out[ROW_DIR] = ax, ay, d
    out[ROW_CARRY] = carry
    out[ROW_STEP] = step_count
    out[ROW_TERM] = terminated.astype(jnp.int32)
    out[ROW_TRUNC] = truncated.astype(jnp.int32)
    # aux: the front-cell write mask + packed cell there before/after the
    # step — everything a _post_step twin needs about the touched cell.
    aux = (fmask, fcell, jnp.where(write, new_fcell, fcell))
    return g, c, out, reward, aux


def _view_bits_block(g, sc, *, W, H, V, see_through):
    """Agent view for a block: ``view[i][j]`` packed cells (agent slot
    overridden with the carried object) plus per-row visibility bitmasks
    ``bits`` (``None`` when ``see_through`` — everything visible).

    Direction-folded separable extraction (port of core/obs.py:55-105) and
    the bit-parallel occlusion flood (core/obs.py:108-154), both expressed on
    the dense block layout (env axis = trailing dims, any tiling).
    """
    ax, ay, d, carry = sc[ROW_AX], sc[ROW_AY], sc[ROW_DIR], sc[ROW_CARRY]
    S = ax.shape
    fx, fy = _dir_vec(d)
    rx, ry = -fy, fx
    horizontal = fx != 0

    g4 = g.reshape((W, H) + S)

    xsel, ysel, x_ok, y_ok = [], [], [], []
    for k in range(V):
        along = V - 1 - k
        across = k - V // 2
        xs = jnp.where(horizontal, ax + fx * along, ax + rx * across)
        ys = jnp.where(horizontal, ay + ry * across, ay + fy * along)
        xsel.append(xs)
        ysel.append(ys)
        x_ok.append((xs >= 0) & (xs < W))
        y_ok.append((ys >= 0) & (ys < H))

    # rows[i] = grid[xsel[i], :]  (one-hot contraction over x)
    rows = []
    for i in range(V):
        acc = jnp.zeros((H,) + S, jnp.int32)
        for x in range(W):
            acc = acc + jnp.where((xsel[i] == x)[None], g4[x], 0)
        rows.append(acc)

    # y one-hot masks, hoisted per j (shared across all i)
    ymask = [[ysel[j] == y for y in range(H)] for j in range(V)]

    wall = jnp.int32(_WALL)
    cells0 = [[None] * V for _ in range(V)]
    for i in range(V):
        for j in range(V):
            acc = jnp.zeros(S, jnp.int32)
            for y in range(H):
                acc = acc + jnp.where(ymask[j][y], rows[i][y], 0)
            cells0[i][j] = jnp.where(x_ok[i] & y_ok[j], acc, wall)

    # Facing east/west the selector-slot axes swap relative to view axes
    # (core/obs.py:101-105): select between the transposed pairs.
    view = [[None] * V for _ in range(V)]
    for a in range(V):
        for b in range(V):
            if a == b:
                view[a][b] = cells0[a][b]
            else:
                view[a][b] = jnp.where(horizontal, cells0[b][a], cells0[a][b])

    # Carried object (or empty) at the agent slot (core/obs.py:168-174).
    agent_cell = jnp.where(carry != 0, carry & 0xFFFF, jnp.int32(OBJ_EMPTY))
    view[V // 2][V - 1] = agent_cell

    if see_through:
        return view, None

    # Bit-parallel occlusion flood (core/obs.py:108-154): per-row int32
    # bitmasks, closed-form rightward carry flood, v-1 leftward spreads.
    full = jnp.int32((1 << V) - 1)
    row_t = []
    for j in range(V):
        t = jnp.zeros(S, jnp.int32)
        for i in range(V):
            vt = view[i][j] & 0xFF
            vs = (view[i][j] >> 16) & 0xFF
            t = t | jnp.where(_see_behind(vt, vs), jnp.int32(1 << i), 0)
        row_t.append(t)

    def flood_right(m, t):
        return m | ((((m & t) + t) & full) ^ t)

    def flood_left(m, t):
        for _ in range(V - 1):
            m = m | ((m & t) >> 1)
        return m

    up = jnp.full(S, 1 << (V // 2), jnp.int32)
    bits = [None] * V
    for j in range(V - 1, -1, -1):
        t = row_t[j]
        m_r = flood_right(up, t)
        cond_r = m_r & t & jnp.int32((1 << (V - 1)) - 1)
        new_up = cond_r | ((cond_r << 1) & full)
        m_l = flood_left(m_r, t)
        cond_l = m_l & t & ~jnp.int32(1)
        bits[j] = m_l
        up = new_up | cond_l | (cond_l >> 1)

    return view, bits


def packed_view_block(g, sc, *, W, H, V, see_through):
    """Packed observation per view slot (gen_obs_packed semantics,
    core/obs.py:178-188): ``out[i][j]`` = visible packed cell, 0 when
    occluded.  Shared by the checksum below and the actor kernel."""
    view, bits = _view_bits_block(g, sc, W=W, H=H, V=V, see_through=see_through)
    if bits is None:
        return view
    out = [[None] * V for _ in range(V)]
    for a in range(V):
        for b in range(V):
            vis = (bits[b] >> a) & 1
            out[a][b] = jnp.where(vis == 1, view[a][b], 0)
    return out


def _obs_checksum_block(g, sc, *, W, H, V, see_through):
    """Sum of the visible packed view cells (full-rank obs consumption)."""
    pv = packed_view_block(g, sc, W=W, H=H, V=V, see_through=see_through)
    S = sc[ROW_AX].shape
    total = jnp.zeros(S, jnp.int32)
    for a in range(V):
        for b in range(V):
            total = total + pv[a][b]
    return total


def _rollout_kernel(
    *refs,
    W,
    H,
    V,
    T,
    R,
    K,
    P,
    see_through,
    compute_obs,
    env,
    ext,
    no_obj=False,
    static_mis=False,
    counter_reset=False,
):
    it = iter(refs)
    actions_ref = next(it)
    grid_i, cont_i, sc_i, mis_i = next(it), next(it), next(it), next(it)
    scal_i = next(it) if K else None
    pl_i = next(it) if P else None
    if counter_reset:
        seeds_ref = next(it)
        cgrid_ref = ccont_ref = csc_ref = cmis_ref = None
        cscal_ref = cpl_ref = None
    else:
        cgrid_ref, ccont_ref, csc_ref, cmis_ref = (
            next(it), next(it), next(it), next(it),
        )
        cscal_ref = next(it) if K else None
        cpl_ref = next(it) if P else None
    grid_o, cont_o, sc_o, mis_o = next(it), next(it), next(it), next(it)
    scal_o = next(it) if K else None
    pl_o = next(it) if P else None
    used_o, obs_o, rew_o, done_o = next(it), next(it), next(it), next(it)

    WH = W * H
    g0 = grid_i[0]
    c0 = cont_i[0]
    sc0 = {r: sc_i[0, r] for r in range(NUM_SC)}
    mis0 = mis_i[0]
    scal0 = tuple(scal_i[0, k] for k in range(K))
    pl0 = tuple(pl_i[0, p] for p in range(P))
    S = sc0[ROW_AX].shape

    def body(t, st):
        g, c, sc_t, mis, scal, planes, used, obs_acc, rew_acc, done_acc = st
        sc = {r: sc_t[r] for r in range(NUM_SC)}
        action = actions_ref[0, t]

        if ext is not None:
            # Pre-action dynamics (e.g. the Dynamic-Obstacles walk); runs
            # before the core step, exactly like step_env's _pre_step call
            # (core/env.py:112-121).
            g, c, sc, scal, planes = ext.pre_step(
                env, W, H, g, c, sc, scal, planes, action
            )
        g_prev, sc_prev = g, sc
        mapped = ext.map_action(env, action) if ext is not None else action
        g, c, sc, reward, aux = _step_block(
            g, c, sc, mapped, W=W, H=H, no_objects=no_obj
        )
        if ext is not None:
            fmask, fcell_prev, fcell_post = aux
            ctx = FusedCtx(
                env=env,
                W=W,
                H=H,
                g_prev=g_prev,
                g_post=g,
                c=c,
                sc_prev=sc_prev,
                sc=sc,
                fmask=fmask,
                fcell_prev=fcell_prev,
                fcell_post=fcell_post,
                action=action,
                reward=reward,
                scal=scal,
                planes=planes,
            )
            term_x, reward, scal, planes = ext.post_step(ctx)
            sc[ROW_TERM] = sc[ROW_TERM] | term_x.astype(jnp.int32)
        done = (sc[ROW_TERM] | sc[ROW_TRUNC]) != 0
        rew_acc = rew_acc + reward
        done_acc = done_acc + done.astype(jnp.int32)

        # Auto-reset.  ``counter_reset`` families (ext.covers_reset)
        # regenerate a FRESH level in-kernel from the counter stream on
        # every episode end — the reference's fresh-reset contract at any
        # episode rate, no cache.  Everyone else blends from the R-slot
        # pre-generated cache (step_cached semantics, core/env.py:176-215;
        # the caller sizes R to cover the measured episode rate,
        # parallel/reset_budget).  Unconditional predicated blend: a
        # ``lax.cond`` on "any env done" measures ~12% SLOWER than always
        # blending (tools/perf_fused_ablate.py — the Mosaic branch costs more
        # than the selects it skips).
        # ``no_obj`` families never write contains (live == cache == zeros,
        # so its blend is the identity); ``static_mis`` families have a
        # seed-independent mission vector (same identity) — both statically
        # skipped per the core/env.py capability contract.
        if counter_reset:
            fg, fc, fsc, fm, fscal, fpl = ext.reset_block(
                env, W, H, seeds_ref[0, 0], seeds_ref[0, 1], used
            )
            fc = fc if not no_obj else None
            fm = fm if not static_mis else None
            fscal = list(fscal)
            fpl = list(fpl)
        else:
            fg = cgrid_ref[0, 0]
            fc = ccont_ref[0, 0] if not no_obj else None
            fsc = {r: csc_ref[0, 0, r] for r in range(NUM_SC)}
            fm = cmis_ref[0, 0] if not static_mis else None
            fscal = [cscal_ref[0, 0, k] for k in range(K)]
            fpl = [cpl_ref[0, 0, p] for p in range(P)]
            for r in range(1, R):
                take = used >= r
                fg = jnp.where(take[None], cgrid_ref[0, r], fg)
                if not no_obj:
                    fc = jnp.where(take[None], ccont_ref[0, r], fc)
                for q in range(NUM_SC):
                    fsc[q] = jnp.where(take, csc_ref[0, r, q], fsc[q])
                if not static_mis:
                    fm = jnp.where(take[None], cmis_ref[0, r], fm)
                for k in range(K):
                    fscal[k] = jnp.where(take, cscal_ref[0, r, k], fscal[k])
                for p in range(P):
                    fpl[p] = jnp.where(take[None], cpl_ref[0, r, p], fpl[p])
        g = jnp.where(done[None], fg, g)
        if not no_obj:
            c = jnp.where(done[None], fc, c)
        for q in range(NUM_SC):
            sc[q] = jnp.where(done, fsc[q], sc[q])
        if not static_mis:
            mis = jnp.where(done[None], fm, mis)
        scal = tuple(
            jnp.where(done, fscal[k], scal[k]) for k in range(K)
        )
        planes = tuple(
            jnp.where(done[None], fpl[p], planes[p]) for p in range(P)
        )
        sc_t = tuple(sc[r] for r in range(NUM_SC))
        used = used + done.astype(jnp.int32)

        if compute_obs:
            obs_acc = obs_acc + _obs_checksum_block(
                g, sc, W=W, H=H, V=V, see_through=see_through
            )

        return (g, c, sc_t, mis, scal, planes, used, obs_acc, rew_acc, done_acc)

    zero = jnp.zeros(S, jnp.int32)
    init = (
        g0,
        c0,
        tuple(sc0[r] for r in range(NUM_SC)),
        mis0,
        scal0,
        pl0,
        zero,
        zero,
        jnp.zeros(S, jnp.float32),
        zero,
    )
    g, c, sc_t, mis, scal, planes, used, obs_acc, rew_acc, done_acc = (
        jax.lax.fori_loop(0, T, body, init)
    )

    grid_o[0] = g
    cont_o[0] = c
    for r in range(NUM_SC):
        sc_o[0, r] = sc_t[r]
    mis_o[0] = mis
    for k in range(K):
        scal_o[0, k] = scal[k]
    for p in range(P):
        pl_o[0, p] = planes[p]
    used_o[0] = used
    obs_o[0] = obs_acc
    rew_o[0] = rew_acc
    done_o[0] = done_acc


def _to_env_tiles(x, Eb, E2):
    """[N, ...rest] -> [Eb, ...rest, E2, 8, 128] (env axis into trailing tile)."""
    rest = x.shape[1:]
    y = x.reshape((Eb, E2, 8, 128) + rest)
    perm = (0,) + tuple(range(4, 4 + len(rest))) + (1, 2, 3)
    return y.transpose(perm)


def _from_env_tiles(x):
    """Inverse of _to_env_tiles: [Eb, ...rest, E2, 8, 128] -> [N, ...rest]."""
    nrest = x.ndim - 4
    perm = (0, nrest + 1, nrest + 2, nrest + 3) + tuple(range(1, nrest + 1))
    y = x.transpose(perm)
    return y.reshape((-1,) + y.shape[4:])


def supports_fused(env) -> bool:
    """True if this family's transition is the default-hook core step, or the
    family publishes a ``fused_ext`` (ops/fused_ext.py) — a block-layout twin
    of its ``_map_action``/``_post_step`` hooks the kernel runs in place."""
    from minigrid_tpu.core.env import MiniGridEnv

    cls = type(env)
    ext = getattr(env, "fused_ext", None)
    if ext is not None:
        # The ext covers _map_action/_post_step, and _pre_step too when it
        # declares covers_pre_step (block twin of the pre-action dynamics);
        # observation must still be the default.
        pre_ok = ext.covers_pre_step or cls._pre_step is MiniGridEnv._pre_step
        return pre_ok and cls.observation is MiniGridEnv.observation
    return (
        cls._pre_step is MiniGridEnv._pre_step
        and cls._post_step is MiniGridEnv._post_step
        and cls._map_action is MiniGridEnv._map_action
        and cls.observation is MiniGridEnv.observation
    )


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def fused_rollout(
    env,
    states,
    key,
    num_steps: int,
    resets_per_chunk: int = 2,
    compute_obs: bool = True,
    interpret: bool | None = None,
):
    """Run ``num_steps`` random-policy steps via the fused kernel.

    Returns ``(final_states, total_reward, episodes_finished, obs_checksum,
    max_used)`` with the same trajectory semantics as the reset-cache path of
    ``rollout_random`` (parallel/vector.py): identical per-step transition,
    auto-reset drawn from ``resets_per_chunk`` pre-generated levels per env.
    ``max_used`` is the largest slot count any env consumed — callers size R
    via parallel/reset_budget and assert ``max_used <= R`` (slot R-1 is
    replayed past that, which the reference's fresh-reset contract forbids).
    The returned states carry a fresh fold of ``key`` as their rng (the
    kernel does not thread the per-env key chain; default-hook families
    never consume it mid-episode).
    """
    N = states.step_count.shape[0]
    T = int(num_steps)
    R = int(resets_per_chunk)
    k_cache, k_act, k_rng = jax.random.split(key, 3)
    actions = jax.random.randint(k_act, (T, N), 0, env.num_actions, jnp.int32)
    ext = getattr(env, "fused_ext", None)
    if ext is not None and getattr(ext, "covers_reset", False):
        # In-kernel fresh-episode generation: per-env counter seeds instead
        # of a pre-generated cache (no covering-R sizing, no generation).
        cache = None
        seeds = jax.random.bits(k_cache, (N, 2), jnp.uint32).astype(jnp.int32)
    else:
        cache = env.batch_reset_cache(k_cache, N, R)
        seeds = None
    final, total_r, total_done, obs_checksum, max_used = fused_rollout_core(
        env, states, cache, actions, compute_obs, interpret, seeds
    )
    final = final.replace(
        rng=jax.vmap(jax.random.fold_in, (None, 0))(k_rng, jnp.arange(N))
    )
    return final, total_r, total_done, obs_checksum, max_used


@partial(jax.jit, static_argnums=(0, 4, 5))
def fused_rollout_core(
    env,
    states,
    cache,
    actions,
    compute_obs: bool = True,
    interpret: bool | None = None,
    reset_seeds=None,
):
    """Fused kernel over explicit ``actions`` int32[T, N] and reset ``cache``
    (leaves [N, R, ...]).  The returned states keep the INPUT rng unchanged
    (callers re-key; see fused_rollout).  Exposed separately so tests can
    drive the kernel and the XLA ``step_cached`` scan with identical inputs.

    ``covers_reset`` families (ext in-kernel generation) take ``reset_seeds``
    int32[N, 2] instead of a cache (pass ``cache=None``): every episode end
    regenerates fresh from the counter stream, so ``max_used`` is 0 — no
    cache slots exist to exhaust.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    N = states.step_count.shape[0]
    W_, H_ = env.width, env.height
    ext = getattr(env, "fused_ext", None)
    K = ext.n_scalars if ext is not None else 0
    P = ext.n_planes if ext is not None else 0
    T = actions.shape[0]
    counter_reset = bool(ext is not None and getattr(ext, "covers_reset", False))
    if counter_reset:
        assert reset_seeds is not None, "covers_reset family needs reset_seeds"
        R = 0
    else:
        R = jax.tree.leaves(cache)[0].shape[1]
    # Block size is VMEM-budgeted: live planes + their R-slot reset cache is
    # ~(2 + P) * (1 + R) * WH * B * 4 bytes; a 2048-env block fits
    # comfortably up to ~12x12 grids at P=0/R=2, larger grids
    # (FourRooms/LockedRoom, 19x19) or plane-carrying exts drop to 1024-env
    # blocks to stay inside the ~16 MB default VMEM core.
    E2 = 2 if (N % 2048 == 0 and (2 + P) * (1 + R) * W_ * H_ <= 864) else 1
    B = E2 * 1024
    assert N % B == 0, f"fused_rollout requires num_envs % {B} == 0 (got {N})"
    Eb = N // B
    W, H = env.width, env.height
    WH = W * H
    V = env.agent_view_size
    # Mission width varies by family (classic 8, BabyAI 44); structural dim.
    MISSION_DIM = states.mission.shape[-1]

    S = (E2, 8, 128)

    def sc_of(st):
        rows = [
            st.agent_x,
            st.agent_y,
            st.agent_dir,
            st.carrying,
            st.step_count,
            st.max_steps,
            st.terminated.astype(jnp.int32),
            st.truncated.astype(jnp.int32),
        ]
        return jnp.stack(rows, axis=-1)  # [..., NUM_SC]

    grid_b = _to_env_tiles(states.grid.reshape(N, WH), Eb, E2)
    cont_b = _to_env_tiles(states.contains.reshape(N, WH), Eb, E2)
    sc_b = _to_env_tiles(sc_of(states), Eb, E2)  # [Eb, NUM_SC, *S]
    mis_b = _to_env_tiles(states.mission, Eb, E2)
    act_b = actions.reshape(T, Eb, E2, 8, 128).transpose(1, 0, 2, 3, 4)

    # Family-ext extra state, packed to int32 scalars/planes (fused_ext.py).
    if ext is not None and (K or P):
        scal_N, pl_N = ext.pack_extra(env, states.extra)  # [N, K], [N, P, WH]
        scal_b = _to_env_tiles(scal_N, Eb, E2) if K else None
        pl_b = _to_env_tiles(pl_N, Eb, E2) if P else None
    else:
        scal_b = pl_b = None

    if counter_reset:
        seeds_b = _to_env_tiles(
            jnp.asarray(reset_seeds, jnp.int32).reshape(N, 2), Eb, E2
        )
        cg = cc = csc = cm = cscal_b = cpl_b = None
    else:
        # Cache leaves are [N, R, ...] (core/env.py batch_reset_cache).
        seeds_b = None
        cg = _to_env_tiles(cache.grid.reshape(N, R, WH), Eb, E2)
        cc = _to_env_tiles(cache.contains.reshape(N, R, WH), Eb, E2)
        csc = _to_env_tiles(sc_of(cache), Eb, E2)  # [Eb, R, NUM_SC, *S]
        cm = _to_env_tiles(cache.mission, Eb, E2)
        if ext is not None and (K or P):
            cscal_N, cpl_N = ext.pack_extra(env, cache.extra)
            cscal_b = _to_env_tiles(cscal_N, Eb, E2) if K else None
            cpl_b = _to_env_tiles(cpl_N, Eb, E2) if P else None
        else:
            cscal_b = cpl_b = None

    def spec(*shape):
        return pl.BlockSpec(
            (1,) + shape, lambda e: (e,) + (0,) * len(shape), memory_space=pltpu.VMEM
        )

    kernel = partial(
        _rollout_kernel,
        W=W,
        H=H,
        V=V,
        T=T,
        R=R,
        K=K,
        P=P,
        see_through=bool(env.see_through_walls),
        compute_obs=bool(compute_obs),
        env=env,
        ext=ext,
        no_obj=bool(getattr(env, "fused_no_objects", False)),
        static_mis=bool(getattr(env, "fused_static_mission", False)),
        counter_reset=counter_reset,
    )

    def maybe(x):
        return [x] if x is not None else []

    if counter_reset:
        reset_inputs = [seeds_b]
        reset_specs = [spec(2, *S)]
    else:
        reset_inputs = (
            [cg, cc, csc, cm] + maybe(cscal_b) + maybe(cpl_b)
        )
        reset_specs = (
            [
                spec(R, WH, *S),
                spec(R, WH, *S),
                spec(R, NUM_SC, *S),
                spec(R, MISSION_DIM, *S),
            ]
            + (maybe(spec(R, K, *S)) if K else [])
            + (maybe(spec(R, P, WH, *S)) if P else [])
        )
    inputs = (
        [act_b, grid_b, cont_b, sc_b, mis_b]
        + maybe(scal_b)
        + maybe(pl_b)
        + reset_inputs
    )
    in_specs = (
        [
            spec(T, *S),
            spec(WH, *S),
            spec(WH, *S),
            spec(NUM_SC, *S),
            spec(MISSION_DIM, *S),
        ]
        + (maybe(spec(K, *S)) if K else [])
        + (maybe(spec(P, WH, *S)) if P else [])
        + reset_specs
    )
    out_shapes = (
        [
            jax.ShapeDtypeStruct((Eb, WH) + S, jnp.int32),  # grid
            jax.ShapeDtypeStruct((Eb, WH) + S, jnp.int32),  # contains
            jax.ShapeDtypeStruct((Eb, NUM_SC) + S, jnp.int32),  # scalars
            jax.ShapeDtypeStruct((Eb, MISSION_DIM) + S, jnp.int32),  # mission
        ]
        + ([jax.ShapeDtypeStruct((Eb, K) + S, jnp.int32)] if K else [])
        + ([jax.ShapeDtypeStruct((Eb, P, WH) + S, jnp.int32)] if P else [])
        + [
            jax.ShapeDtypeStruct((Eb,) + S, jnp.int32),  # used
            jax.ShapeDtypeStruct((Eb,) + S, jnp.int32),  # obs checksum
            jax.ShapeDtypeStruct((Eb,) + S, jnp.float32),  # reward sum
            jax.ShapeDtypeStruct((Eb,) + S, jnp.int32),  # done count
        ]
    )
    out_specs = (
        [
            spec(WH, *S),
            spec(WH, *S),
            spec(NUM_SC, *S),
            spec(MISSION_DIM, *S),
        ]
        + (maybe(spec(K, *S)) if K else [])
        + (maybe(spec(P, WH, *S)) if P else [])
        + [spec(*S), spec(*S), spec(*S), spec(*S)]
    )
    # Live planes + their R-slot cache are (2 + P) * (1 + R) * WH * B * 4
    # bytes, and Pallas double-buffers input blocks across grid steps; large
    # grids (FourRooms 19x19) exceed the compiler's default 16 MB scoped-VMEM
    # cap, so raise the cap to what the block actually needs (v5e: 128 MB).
    vmem_limit = max(
        16 * 1024 * 1024,
        int((2 + P) * (1 + R) * WH * B * 4 * 3.2) + 6 * 1024 * 1024,
    )
    outs = pl.pallas_call(
        kernel,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
        grid=(Eb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    )(*inputs)

    outs = list(outs)
    grid_f, cont_f, sc_f, mis_f = outs[:4]
    rest = outs[4:]
    scal_f = rest.pop(0) if K else None
    pl_f = rest.pop(0) if P else None
    used_f, obs_f, rew_f, done_f = rest
    sc = _from_env_tiles(sc_f)  # [N, NUM_SC]
    final = states.replace(
        grid=_from_env_tiles(grid_f).reshape(N, W, H),
        contains=_from_env_tiles(cont_f).reshape(N, W, H),
        agent_x=sc[:, ROW_AX],
        agent_y=sc[:, ROW_AY],
        agent_dir=sc[:, ROW_DIR],
        carrying=sc[:, ROW_CARRY],
        step_count=sc[:, ROW_STEP],
        max_steps=sc[:, ROW_MAX],
        terminated=sc[:, ROW_TERM] != 0,
        truncated=sc[:, ROW_TRUNC] != 0,
        mission=_from_env_tiles(mis_f),
    )
    if ext is not None and (K or P):
        final = final.replace(
            extra=ext.unpack_extra(
                env,
                _from_env_tiles(scal_f) if K else None,
                _from_env_tiles(pl_f) if P else None,
            )
        )
    total_r = _from_env_tiles(rew_f).sum()
    total_done = _from_env_tiles(done_f).sum()
    obs_checksum = _from_env_tiles(obs_f).sum()
    # counter_reset: every reset regenerated fresh in-kernel — there is no
    # cache to exhaust, so the consumed-slot maximum is 0 by construction.
    max_used = (
        jnp.zeros((), jnp.int32) if counter_reset else _from_env_tiles(used_f).max()
    )
    return final, total_r, total_done, obs_checksum, max_used

"""Egocentric observation kernel.

The reference builds the agent view by slicing a sub-grid, rotating it
``agent_dir + 1`` times, flood-processing occlusion, then encoding
(reference: minigrid/minigrid_env.py:597-650, minigrid/core/grid.py:110-143,
:244-268, :291-328).  Here slice+rotate collapse into one separable pair of
direction-parameterized one-hot reads of the packed grid, and the sequential
occlusion sweep becomes a closed-form carry flood — both fully vectorizable
over the env batch (gathers are avoided: a TPU row-gather costs ~5x a fused
one-hot reduce at rollout batch sizes, tools/perf_probe.py).

View coordinates: the agent sits at (v//2, v-1) facing "up" (decreasing j).
For view cell (vi, vj) the world coordinate is

    world = agent_pos + f * (v-1-vj) - r * (v//2 - vi)

with f = DIR_TO_VEC[agent_dir] and r = (-f_y, f_x) the right vector — the
same transform the reference applies in get_full_render
(minigrid/minigrid_env.py:679-696), verified cell-for-cell against
slice+rotate_left semantics by the golden tests.
"""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core.constants import (
    OBJ_EMPTY,
    WALL_CELL,
    carry_color,
    carry_type,
    cell,
    cell_state,
    cell_type,
    see_behind,
    unpack_grid,
)

_DX = jnp.array([1, 0, -1, 0], dtype=jnp.int32)
_DY = jnp.array([0, 1, 0, -1], dtype=jnp.int32)


def view_world_coords(agent_x, agent_y, agent_dir, view_size: int):
    """int32 [v, v] world x and y coordinates of each view cell (may be OOB)."""
    v = view_size
    fx, fy = _DX[agent_dir], _DY[agent_dir]
    rx, ry = -fy, fx  # right vector
    vi = jnp.arange(v, dtype=jnp.int32)[:, None]  # view column
    vj = jnp.arange(v, dtype=jnp.int32)[None, :]  # view row
    wx = agent_x + fx * (v - 1 - vj) - rx * (v // 2 - vi)
    wy = agent_y + fy * (v - 1 - vj) - ry * (v // 2 - vi)
    return wx, wy


def extract_view(grid: jnp.ndarray, agent_x, agent_y, agent_dir, view_size: int):
    """Packed int32[v, v] agent-frame view; out-of-bounds reads as Wall.

    Matches reference ``Grid.slice`` OOB behavior
    (minigrid/core/grid.py:136-141) composed with the rotations of
    ``gen_obs_grid`` (minigrid/minigrid_env.py:609-612).

    Direction-folded separable formulation: the window read is two one-hot
    contractions (a [v, W] row selector then a [v, H] column selector)
    whose INDICES carry the agent direction, so the grid is read exactly
    once and never rotated.  (An earlier design rotated the grid into a
    canonical agent-faces-up frame first; under vmap the traced-direction
    switch lowers to a select over all four rotated copies — 4x grid
    traffic per step.)
    """
    width, height = grid.shape[:2]
    v = view_size
    ax = jnp.asarray(agent_x, jnp.int32)
    ay = jnp.asarray(agent_y, jnp.int32)
    d = jnp.asarray(agent_dir, jnp.int32)

    # For every direction the window read is SEPARABLE without rotating the
    # grid: one of (wx, wy) depends only on the view column vi and the other
    # only on the view row vj (DIR_TO_VEC components are one-hot).  Fold the
    # direction into the two one-hot selectors instead of materializing four
    # rotated grid copies — under vmap a traced-direction lax.switch lowers
    # to a select over ALL branches, so the rotation form costs 4x the grid
    # traffic plus relayout transposes per step.
    fx, fy = _DX[d], _DY[d]
    rx, ry = -fy, fx  # right vector
    k = jnp.arange(v, dtype=jnp.int32)
    along = v - 1 - k  # distance ahead of the agent for view row k
    across = k - v // 2  # offset right of the agent for view column k
    horizontal = fx != 0  # facing east/west: wx varies with vj, wy with vi
    xsel_idx = jnp.where(horizontal, ax + fx * along, ax + rx * across)
    ysel_idx = jnp.where(horizontal, ay + ry * across, ay + fy * along)
    ohx = xsel_idx[:, None] == jnp.arange(width, dtype=jnp.int32)[None, :]  # [v, W]
    ohy = ysel_idx[:, None] == jnp.arange(height, dtype=jnp.int32)[None, :]  # [v, H]

    # rows[k, y] = grid[xsel_idx[k], y]; cells0[kx, ky] = grid[xsel[kx], ysel[ky]]
    rows = jnp.max(jnp.where(ohx[:, :, None], grid[None, :, :], 0), axis=1)  # [v, H]
    cells0 = jnp.max(jnp.where(ohy[None, :, :], rows[:, None, :], 0), axis=-1)  # [v, v]
    x_ok = (xsel_idx >= 0) & (xsel_idx < width)
    y_ok = (ysel_idx >= 0) & (ysel_idx < height)
    cells0 = jnp.where(x_ok[:, None] & y_ok[None, :], cells0, WALL_CELL)

    # Map selector-slot axes back to view axes: facing north/south the x
    # selector runs over view columns (vi) and the y selector over view rows
    # (vj) — cells0 is already [vi, vj]; facing east/west the roles swap —
    # transpose the tiny [v, v] result instead of the whole grid.
    return jnp.where(horizontal, cells0.T, cells0)


def process_vis(trans: jnp.ndarray) -> jnp.ndarray:
    """Visibility mask for a [v, v] transparency grid (agent-frame view).

    Exactly reproduces the reference's two-directional bottom-up sweep
    (reference: minigrid/core/grid.py:291-328): per row, light floods right
    then left through transparent cells, each lit transparent cell also
    lighting its three upward neighbors.

    BIT-PARALLEL formulation: each row's masks pack into one int32 scalar
    per environment (bit i = column i), so under ``vmap`` every operation is
    a full-lane [N] vector op instead of a lane-starved [N, v] op.  The
    rightward transitive flood ``m[i+1] |= m[i] & t[i]`` has the closed
    carry form ``m | (((m & t) + t) ^ t)`` (carries propagate through
    transparent runs exactly like light); the leftward flood uses v-1
    single-step spreads.  Exhaustively validated against the sequential
    sweep.

    ``trans`` is indexed [i, j] = [column, row]; the agent cell
    (v//2, v-1) seeds the mask.
    """
    v = trans.shape[-1]
    full = (1 << v) - 1
    weights = 1 << jnp.arange(v, dtype=jnp.int32)
    row_t = [jnp.sum(jnp.where(trans[:, j], weights, 0)) for j in range(v)]

    def flood_right(m, t):
        return m | ((((m & t) + t) & full) ^ t)

    def flood_left(m, t):
        for _ in range(v - 1):
            m = m | ((m & t) >> 1)
        return m

    up = jnp.int32(1 << (v // 2))  # agent-row seed for j = v-1
    rows_out = [None] * v
    for j in range(v - 1, -1, -1):
        t = row_t[j]
        m_r = flood_right(up, t)
        cond_r = m_r & t & ((1 << (v - 1)) - 1)
        new_up = cond_r | ((cond_r << 1) & full)
        m_l = flood_left(m_r, t)
        cond_l = m_l & t & ~1
        rows_out[j] = m_l
        up = new_up | cond_l | (cond_l >> 1)
    bits = jnp.stack(rows_out)  # [v] (indexed by row j)
    out = (bits[None, :] >> jnp.arange(v, dtype=jnp.int32)[:, None]) & 1
    return out.astype(bool)  # [i, j]


def view_and_vis(state, view_size: int, see_through_walls: bool):
    """Packed int32[v, v] view (agent cell overridden with the carried
    object) and bool[v, v] visibility mask."""
    v = view_size
    cells = extract_view(
        state.grid, state.agent_x, state.agent_y, state.agent_dir, v
    )
    if see_through_walls:
        vis = jnp.ones((v, v), dtype=bool)
    else:
        vis = process_vis(see_behind(cell_type(cells), cell_state(cells)))
    # Carried object (or empty) shown at the agent cell
    # (reference: minigrid/minigrid_env.py:623-630).
    carry = state.carrying
    agent_cell = jnp.where(
        carry != 0, cell(carry_type(carry), carry_color(carry)), cell(OBJ_EMPTY)
    )
    cells = cells.at[v // 2, v - 1].set(agent_cell)
    return cells, vis


def gen_obs_packed(state, view_size: int, see_through_walls: bool) -> jnp.ndarray:
    """int32[v, v] PACKED partial observation (type | color<<8 | state<<16).

    Same pipeline as :func:`gen_obs_image` minus the final unpack to uint8
    planes — invisible cells are 0 ("unseen").  This is the learner-side
    observation: it is the pre-unpack value of the reference encoding, so
    ``unpack_grid(gen_obs_packed(...)) == gen_obs_image(...)`` exactly, while
    avoiding the layout-hostile size-3 minor dimension in stored rollouts.
    """
    cells, vis = view_and_vis(state, view_size, see_through_walls)
    return jnp.where(vis, cells, 0)


def gen_obs_image(state, view_size: int, see_through_walls: bool) -> jnp.ndarray:
    """uint8[v, v, 3] encoded partial observation.

    Pipeline parity with reference ``gen_obs_grid``/``gen_obs``
    (minigrid/minigrid_env.py:597-650): gather view, occlusion mask (unless
    see_through_walls), overwrite the agent cell with the carried object (or
    empty), zero out invisible cells ("unseen" encoding).
    """
    return unpack_grid(gen_obs_packed(state, view_size, see_through_walls))


def gen_obs(state, view_size: int, see_through_walls: bool):
    """Full observation dict for one env state."""
    image = gen_obs_image(state, view_size, see_through_walls)
    return {"image": image, "direction": state.agent_dir, "mission": state.mission}

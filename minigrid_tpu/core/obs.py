"""Egocentric observation kernel.

The reference builds the agent view by slicing a sub-grid, rotating it
``agent_dir + 1`` times, flood-processing occlusion, then encoding
(reference: minigrid/minigrid_env.py:597-650, minigrid/core/grid.py:110-143,
:244-268, :291-328).  Here slice+rotate collapse into ONE direction-
parameterized one-hot read of the packed grid, and the sequential occlusion
sweep becomes a closed-form cummax flood — both fully vectorizable over the
env batch (gathers are avoided: a TPU row-gather costs ~5x a fused one-hot
reduce at rollout batch sizes, tools/perf_probe.py).

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
    """One-hot-read the packed int32[v, v] agent-frame view; out-of-bounds
    reads as Wall.

    Matches reference ``Grid.slice`` OOB behavior
    (minigrid/core/grid.py:136-141) composed with the rotations of
    ``gen_obs_grid`` (minigrid/minigrid_env.py:609-612).
    """
    width, height = grid.shape[:2]
    v = view_size
    wx, wy = view_world_coords(agent_x, agent_y, agent_dir, v)
    inb = (wx >= 0) & (wx < width) & (wy >= 0) & (wy < height)
    flat_idx = jnp.clip(wx, 0, width - 1) * height + jnp.clip(wy, 0, height - 1)
    # [v*v, W*H] one-hot contraction, fused by XLA into one pass over the grid.
    gridf = grid.reshape(width * height)
    onehot = flat_idx.reshape(v * v, 1) == jnp.arange(width * height, dtype=jnp.int32)
    cells = jnp.max(jnp.where(onehot, gridf, 0), axis=-1).reshape(v, v)
    return jnp.where(inb, cells, WALL_CELL)


def _flood_right(m0: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Closed form of the in-row chain ``m[i+1] |= m[i] & trans[i]``.

    m[i] = m0[i] OR (exists k < i with m0[k] and trans true on [k, i-1]),
    computed with two cumulative maxima instead of a sequential loop.
    """
    import jax.lax as lax

    v = m0.shape[-1]
    idx = jnp.arange(v, dtype=jnp.int32)
    last_vis = lax.cummax(jnp.where(m0, idx, -1), axis=m0.ndim - 1)
    last_opq = lax.cummax(jnp.where(~trans, idx, -1), axis=m0.ndim - 1)
    chain = last_vis > last_opq  # at i: some visible k <= i with clear path to i+1
    shifted = jnp.concatenate([jnp.zeros_like(chain[..., :1]), chain[..., :-1]], -1)
    return m0 | shifted


def _flood_left(m0: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    return _flood_right(m0[..., ::-1], trans[..., ::-1])[..., ::-1]


def _shift_up(x):  # up[i+1] |= x[i]
    return jnp.concatenate([jnp.zeros_like(x[..., :1]), x[..., :-1]], -1)


def _shift_down(x):  # up[i-1] |= x[i]
    return jnp.concatenate([x[..., 1:], jnp.zeros_like(x[..., :1])], -1)


def process_vis(trans: jnp.ndarray) -> jnp.ndarray:
    """Visibility mask for a [v, v] transparency grid (agent-frame view).

    Exactly reproduces the reference's two-directional bottom-up sweep
    (reference: minigrid/core/grid.py:291-328): per row, light floods right
    then left through transparent cells, each lit transparent cell also
    lighting its three upward neighbors.  Rows are processed bottom-to-top;
    in-row chains use the closed-form cummax flood.

    ``trans`` is indexed [i, j] = [column, row]; the agent cell
    (v//2, v-1) seeds the mask.
    """
    v = trans.shape[-1]
    agent_row = jnp.zeros((v,), dtype=bool).at[v // 2].set(True)

    up = jnp.zeros((v,), dtype=bool)
    rows_out = [None] * v
    m_init = agent_row
    for j in range(v - 1, -1, -1):
        t = trans[:, j]
        m0 = m_init if j == v - 1 else up
        # right pass: i in [0, v-2]
        m_r = _flood_right(m0, t)
        cond_r = (m_r & t).at[v - 1].set(False)
        new_up = cond_r | _shift_up(cond_r)
        # left pass continues from the right-pass mask: i in [1, v-1]
        m_l = _flood_left(m_r, t)
        cond_l = (m_l & t).at[0].set(False)
        new_up = new_up | cond_l | _shift_down(cond_l)
        rows_out[j] = m_l
        up = new_up
    return jnp.stack(rows_out, axis=1)  # [i, j]


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


def gen_obs_image(state, view_size: int, see_through_walls: bool) -> jnp.ndarray:
    """uint8[v, v, 3] encoded partial observation.

    Pipeline parity with reference ``gen_obs_grid``/``gen_obs``
    (minigrid/minigrid_env.py:597-650): gather view, occlusion mask (unless
    see_through_walls), overwrite the agent cell with the carried object (or
    empty), zero out invisible cells ("unseen" encoding).
    """
    cells, vis = view_and_vis(state, view_size, see_through_walls)
    return unpack_grid(jnp.where(vis, cells, 0))


def gen_obs(state, view_size: int, see_through_walls: bool):
    """Full observation dict for one env state."""
    image = gen_obs_image(state, view_size, see_through_walls)
    return {"image": image, "direction": state.agent_dir, "mission": state.mission}

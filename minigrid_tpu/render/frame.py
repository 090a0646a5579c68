"""Frame rendering: full-grid and agent-POV RGB frames
(reference: minigrid/minigrid_env.py:652-739)."""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core import obs as obs_lib
from minigrid_tpu.core.constants import TILE_PIXELS
from minigrid_tpu.render.atlas import render_grid


def _view_and_vis(state, view_size: int, see_through_walls: bool):
    cells, vis = obs_lib.view_and_vis(state, view_size, see_through_walls)
    # Invisible cells render as "unseen" (black) — the reference nulls them
    # in process_vis (grid.py:323-327).
    cells = jnp.where(vis, cells, 0)
    return cells, vis


def get_pov_render(state, view_size: int, see_through_walls: bool, tile_size: int):
    """Agent's point-of-view frame (reference: minigrid_env.py:652-666)."""
    cells, vis = _view_and_vis(state, view_size, see_through_walls)
    return render_grid(
        cells,
        tile_size,
        agent_pos=jnp.array([view_size // 2, view_size - 1]),
        agent_dir=3,
        highlight_mask=vis,
    )


def get_full_render(state, view_size: int, see_through_walls: bool, tile_size: int, highlight: bool):
    """Whole-grid frame with the agent's visible cells highlighted
    (reference: minigrid_env.py:668-714)."""
    w, h = state.grid.shape[:2]
    hl = None
    if highlight:
        _, vis = _view_and_vis(state, view_size, see_through_walls)
        x, y = obs_lib.view_world_coords(
            state.agent_x, state.agent_y, state.agent_dir, view_size
        )
        inb = (x >= 0) & (x < w) & (y >= 0) & (y < h)
        flat = jnp.clip(x, 0, w - 1) * h + jnp.clip(y, 0, h - 1)
        hl = (
            jnp.zeros((w * h,), bool)
            .at[flat.reshape(-1)]
            .max((vis & inb).reshape(-1))
            .reshape(w, h)
        )
    return render_grid(
        state.grid,
        tile_size,
        agent_pos=(state.agent_x, state.agent_y),
        agent_dir=state.agent_dir,
        highlight_mask=hl,
    )


def get_frame(
    state,
    view_size: int,
    see_through_walls: bool,
    highlight: bool = True,
    tile_size: int = TILE_PIXELS,
    agent_pov: bool = False,
):
    """RGB frame (reference: minigrid_env.py:716-739)."""
    if agent_pov:
        return get_pov_render(state, view_size, see_through_walls, tile_size)
    return get_full_render(state, view_size, see_through_walls, tile_size, highlight)

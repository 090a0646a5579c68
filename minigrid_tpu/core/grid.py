"""Functional grid construction and access primitives.

Replaces the reference's mutable ``Grid`` container
(reference: minigrid/core/grid.py:20-143) with pure functions over a packed
int32[W, H] cell array (type | color << 8 | state << 16 — see
minigrid_tpu/core/constants.py).  All coordinate arguments may be traced
scalars: writes are iota-mask blends and reads are one-hot reductions, both
of which XLA fuses into full-lane vector ops (TPU gathers on small rows are
~5x slower than one-hot reduce at rollout batch sizes — measured in
tools/perf_probe.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core.constants import EMPTY_CELL, OBJ_EMPTY, WALL_CELL, cell_type


def coord_grids(width: int, height: int):
    """Return int32 [W, H] arrays of x and y coordinates."""
    xs = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[:, None], (width, height))
    ys = jnp.broadcast_to(jnp.arange(height, dtype=jnp.int32)[None, :], (width, height))
    return xs, ys


def empty_grid(width: int, height: int) -> jnp.ndarray:
    """All-empty packed int32[W, H] grid."""
    return jnp.full((width, height), EMPTY_CELL, dtype=jnp.int32)


def put(grid: jnp.ndarray, mask: jnp.ndarray, cell_value) -> jnp.ndarray:
    """Write packed ``cell_value`` at every cell where ``mask`` is True."""
    return jnp.where(mask, jnp.asarray(cell_value, jnp.int32), grid)


def rect_mask(width: int, height: int, x0, y0, w, h) -> jnp.ndarray:
    """Boolean [W, H] mask of the rectangle [x0, x0+w) x [y0, y0+h).

    Coordinates/sizes may be traced scalars.
    """
    xs, ys = coord_grids(width, height)
    return (xs >= x0) & (xs < x0 + w) & (ys >= y0) & (ys < y0 + h)


def horz_wall_mask(width: int, height: int, x, y, length=None) -> jnp.ndarray:
    """Mask for a horizontal run of cells starting at (x, y).

    Matches reference ``Grid.horz_wall`` (minigrid/core/grid.py:80-90):
    default length runs to the right edge.
    """
    if length is None:
        length = width - x
    return rect_mask(width, height, x, y, length, 1)


def vert_wall_mask(width: int, height: int, x, y, length=None) -> jnp.ndarray:
    """Mask for a vertical run of cells starting at (x, y)
    (reference: minigrid/core/grid.py:92-102)."""
    if length is None:
        length = height - y
    return rect_mask(width, height, x, y, 1, length)


def wall_rect(grid: jnp.ndarray, x, y, w, h) -> jnp.ndarray:
    """Draw the one-cell-thick wall outline of a rectangle
    (reference: minigrid/core/grid.py:104-108)."""
    width, height = grid.shape[:2]
    outer = rect_mask(width, height, x, y, w, h)
    inner = rect_mask(width, height, x + 1, y + 1, w - 2, h - 2)
    return put(grid, outer & ~inner, WALL_CELL)


def cell_mask(width: int, height: int, x, y) -> jnp.ndarray:
    """One-hot bool[W, H] mask of the (possibly traced) cell (x, y)."""
    xs, ys = coord_grids(width, height)
    return (xs == x) & (ys == y)


def set_cell(grid: jnp.ndarray, x, y, cell_value) -> jnp.ndarray:
    """Write one cell at (possibly traced) coordinates (x, y)."""
    width, height = grid.shape[:2]
    return put(grid, cell_mask(width, height, x, y), cell_value)


def get_cell(grid: jnp.ndarray, x, y) -> jnp.ndarray:
    """Read the packed cell at (possibly traced) coordinates (x, y).

    One-hot max-reduce instead of a gather: at rollout batch sizes a TPU
    row-gather costs ~290us/iter vs ~56us for the reduce (tools/perf_probe.py).
    """
    width, height = grid.shape[:2]
    m = cell_mask(width, height, x, y)
    return jnp.max(jnp.where(m, grid, 0))


def free_mask(grid: jnp.ndarray, agent_pos=None) -> jnp.ndarray:
    """Cells that are empty and (optionally) not under the agent.

    Mirrors the acceptance condition of the reference's rejection sampler
    ``place_obj`` (reference: minigrid/minigrid_env.py:339-364).
    """
    m = cell_type(grid) == OBJ_EMPTY
    if agent_pos is not None:
        m = m & ~cell_mask(grid.shape[0], grid.shape[1], agent_pos[0], agent_pos[1])
    return m

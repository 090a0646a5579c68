"""Functional grid construction and access primitives.

Replaces the reference's mutable ``Grid`` container
(reference: minigrid/core/grid.py:20-143) with pure functions over the dense
uint8[W, H, 3] cell array.  All coordinate arguments may be traced scalars:
writes are expressed as iota-mask blends rather than scatters, which XLA
fuses into cheap vector selects.
"""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core.constants import EMPTY_CELL, WALL_CELL


def coord_grids(width: int, height: int):
    """Return int32 [W, H] arrays of x and y coordinates."""
    xs = jnp.broadcast_to(jnp.arange(width, dtype=jnp.int32)[:, None], (width, height))
    ys = jnp.broadcast_to(jnp.arange(height, dtype=jnp.int32)[None, :], (width, height))
    return xs, ys


def empty_grid(width: int, height: int) -> jnp.ndarray:
    """All-empty uint8[W, H, 3] grid."""
    return jnp.broadcast_to(EMPTY_CELL, (width, height, 3)).astype(jnp.uint8)


def put(grid: jnp.ndarray, mask: jnp.ndarray, cell_value: jnp.ndarray) -> jnp.ndarray:
    """Write ``cell_value`` (uint8[3]) at every cell where ``mask`` is True."""
    return jnp.where(mask[:, :, None], cell_value.astype(jnp.uint8), grid)


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


def set_cell(grid: jnp.ndarray, x, y, cell_value: jnp.ndarray) -> jnp.ndarray:
    """Write one cell at (possibly traced) coordinates (x, y)."""
    width, height = grid.shape[:2]
    xs, ys = coord_grids(width, height)
    mask = (xs == x) & (ys == y)
    return put(grid, mask, cell_value)


def set_cell_plane(plane: jnp.ndarray, x, y, value: jnp.ndarray) -> jnp.ndarray:
    """Write one entry of an auxiliary [W, H, C] plane (e.g. ``contains``)."""
    width, height = plane.shape[:2]
    xs, ys = coord_grids(width, height)
    mask = (xs == x) & (ys == y)
    return jnp.where(mask[:, :, None], value.astype(plane.dtype), plane)


def get_cell(grid: jnp.ndarray, x, y) -> jnp.ndarray:
    """Read the uint8[3] cell at (possibly traced) coordinates (x, y)."""
    width, height = grid.shape[:2]
    flat = grid.reshape(width * height, grid.shape[2])
    idx = jnp.asarray(x, jnp.int32) * height + jnp.asarray(y, jnp.int32)
    return flat[idx]


def free_mask(grid: jnp.ndarray, agent_pos=None) -> jnp.ndarray:
    """Cells that are empty and (optionally) not under the agent.

    Mirrors the acceptance condition of the reference's rejection sampler
    ``place_obj`` (reference: minigrid/minigrid_env.py:339-364).
    """
    from minigrid_tpu.core.constants import OBJ_EMPTY

    m = grid[:, :, 0] == OBJ_EMPTY
    if agent_pos is not None:
        xs, ys = coord_grids(*grid.shape[:2])
        m = m & ~((xs == agent_pos[0]) & (ys == agent_pos[1]))
    return m

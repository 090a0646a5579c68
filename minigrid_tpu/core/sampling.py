"""Key-driven placement sampling.

The reference places objects by rejection sampling uniform positions inside a
rectangle until a free cell is hit (reference: minigrid/minigrid_env.py:313-372).
Conditioned on acceptance that is exactly the uniform distribution over free
cells of the rectangle, so on device we sample it directly with one masked
categorical draw — no data-dependent loop, identical distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.grid import coord_grids, free_mask, rect_mask


def masked_uniform_index(key: jax.Array, flat_mask: jnp.ndarray) -> jnp.ndarray:
    """Uniformly sample one True index of bool[N] ``flat_mask`` (int32).

    Count-and-rank draw: one randint in [0, count) plus a cumsum rank match.
    Exactly the uniform distribution over set bits — identical to a masked
    categorical — but ~10x cheaper on the VPU (no per-cell Gumbel
    transcendentals).  All-False masks yield index 0 (callers must guarantee
    feasibility, as the reference guarantees loop termination).
    """
    vi = flat_mask.astype(jnp.int32)
    cnt = vi.sum()
    r = jax.random.randint(key, (), 0, jnp.maximum(cnt, 1), dtype=jnp.int32)
    rank = jnp.cumsum(vi) - 1
    return jnp.argmax(flat_mask & (rank == r)).astype(jnp.int32)


def sample_mask_cell(key: jax.Array, mask: jnp.ndarray) -> jnp.ndarray:
    """Uniformly sample one True cell of bool[W, H] ``mask``; returns int32[2].

    If the mask is all-False the result is an arbitrary cell (callers must
    guarantee feasibility, as the reference guarantees loop termination).
    """
    width, height = mask.shape
    idx = masked_uniform_index(key, mask.reshape(-1))
    return jnp.stack([idx // height, idx % height]).astype(jnp.int32)


def place_obj_pos(
    key: jax.Array,
    grid: jnp.ndarray,
    agent_pos=None,
    top=None,
    size=None,
    reject: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sample a placement position with the same acceptance rule as the
    reference's ``place_obj`` (minigrid/minigrid_env.py:339-364): inside the
    [top, top+size) rectangle, on an empty cell, not under the agent, and not
    where ``reject`` (bool[W, H]) is True."""
    width, height = grid.shape[:2]
    m = free_mask(grid, agent_pos)
    if top is not None or size is not None:
        t = (0, 0) if top is None else top
        s = (width, height) if size is None else size
        tx = jnp.maximum(jnp.asarray(t[0]), 0)
        ty = jnp.maximum(jnp.asarray(t[1]), 0)
        m = m & rect_mask(width, height, tx, ty, s[0], s[1])
    if reject is not None:
        m = m & ~reject
    return sample_mask_cell(key, m)


def randint(key: jax.Array, low, high) -> jnp.ndarray:
    """Random int32 in [low, high) (reference `_rand_int`,
    minigrid/minigrid_env.py:247-252)."""
    return jax.random.randint(key, (), low, high, dtype=jnp.int32)


def rand_dir(key: jax.Array) -> jnp.ndarray:
    return jax.random.randint(key, (), 0, 4, dtype=jnp.int32)


def neighbor_mask(width: int, height: int, pos, radius: int = 1) -> jnp.ndarray:
    """bool[W, H] mask of the (2r+1)^2 box centered at ``pos``."""
    xs, ys = coord_grids(width, height)
    return (
        (xs >= pos[0] - radius)
        & (xs <= pos[0] + radius)
        & (ys >= pos[1] - radius)
        & (ys <= pos[1] + radius)
    )

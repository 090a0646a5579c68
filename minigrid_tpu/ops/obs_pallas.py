"""Fused egocentric-observation kernel (Pallas, TPU).

One VMEM-resident pass per block of envs computes what the XLA path does in
~80 small fused ops (minigrid_tpu/core/obs.py): direction-parameterized view
extraction from the packed grid, the reference-exact two-directional
occlusion flood (reference: minigrid/core/grid.py:291-328), the carried-
object agent-cell override, and unseen-cell zeroing.  Grid blocks are
[B, W*H] int32 in VMEM; all view math runs on [B, v*v] lanes with the view
flattened vj-major so in-row floods are lane-group scans.

Public entry: :func:`fused_obs_packed` — returns the packed int32[N, v, v]
observation (0 = unseen); callers unpack to the uint8 encoding.

Status: bit-exact vs the XLA path (tests/test_pallas_ops.py; verified
compiled on TPU over 2048 random DoorKey states) but NOT faster — XLA fuses
the one-hot extraction + flood into a handful of kernels already, and
Mosaic's per-op overhead on the small [B, 49] tiles dominates at practical
block sizes.  Kept as the reference Pallas implementation of the obs op; the
default observation path remains minigrid_tpu/core/obs.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from minigrid_tpu.core.constants import (
    OBJ_DOOR,
    OBJ_EMPTY,
    STATE_OPEN,
    WALL_CELL,
)

_DX = (1, 0, -1, 0)
_DY = (0, 1, 0, -1)
_WALL = int(WALL_CELL)  # python int: jax-array constants can't be captured


# Mosaic's vector rotate only supports 32-bit lanes, so every flood mask in
# this kernel is an int32 0/1 "semiring" value: OR = maximum, AND = minimum.


def _shift_vi(x, k, vi):
    """Shift +k along the vi axis of a [B, v*v] vj-major int32 view tensor
    (lane shift by k inside each v-lane row group); shifted-in lanes are 0."""
    return jnp.where(vi >= k, pltpu.roll(x, k, axis=1), 0)


def _shift_vi_neg(x, k, vi, v):
    # pltpu.roll requires non-negative shifts: -k == L-k (mod lane count).
    return jnp.where(vi < v - k, pltpu.roll(x, x.shape[1] - k, axis=1), 0)


def _cummax_vi(x, vi, v):
    """Running max along vi within each row group (doubling steps)."""
    k = 1
    while k < v:
        x = jnp.maximum(x, jnp.where(vi >= k, pltpu.roll(x, k, axis=1), -1))
        k *= 2
    return x


def _cummax_rvi(x, vi, v):
    """Running max along DECREASING vi within each row group."""
    k = 1
    while k < v:
        x = jnp.maximum(
            x, jnp.where(vi < v - k, pltpu.roll(x, x.shape[1] - k, axis=1), -1)
        )
        k *= 2
    return x


def _flood_right(m0, trans, vi, v):
    """Closed form of m[i+1] |= m[i] & trans[i] (core/obs.py:_flood_right);
    m0/trans are int32 0/1."""
    last_vis = _cummax_vi(jnp.where(m0 > 0, vi, -1), vi, v)
    last_opq = _cummax_vi(jnp.where(trans == 0, vi, -1), vi, v)
    chain = jnp.where(last_vis > last_opq, 1, 0)
    return jnp.maximum(m0, _shift_vi(chain, 1, vi))


def _flood_left(m0, trans, vi, v):
    """Mirror flood: reverse vi via the closed form on flipped indices."""
    rvi = (v - 1) - vi
    last_vis = _cummax_rvi(jnp.where(m0 > 0, rvi, -1), vi, v)
    last_opq = _cummax_rvi(jnp.where(trans == 0, rvi, -1), vi, v)
    chain = jnp.where(last_vis > last_opq, 1, 0)
    return jnp.maximum(m0, _shift_vi_neg(chain, 1, vi, v))


def _kernel(grid_ref, ax_ref, ay_ref, dir_ref, carry_ref, out_ref, *, W, H, v, stw):
    B = grid_ref.shape[0]
    VV = v * v
    grid = grid_ref[:]  # [B, W*H]
    ax = ax_ref[:, 0]  # scalars carried as [B, 1] (1-D layouts confuse Mosaic)
    ay = ay_ref[:, 0]
    d = dir_ref[:, 0]
    carry = carry_ref[:, 0]

    # Direction unit vectors as arithmetic in d (avoids 1-D gathers).
    #   dx = (1,0,-1,0)[d],  dy = (0,1,0,-1)[d]
    dx = jnp.where(d == 0, 1, jnp.where(d == 2, -1, 0))
    dy = jnp.where(d == 1, 1, jnp.where(d == 3, -1, 0))
    rx, ry = -dy, dx  # right vector

    # View-cell indices, vj-major flat layout.
    flatv = jax.lax.broadcasted_iota(jnp.int32, (B, VV), 1)
    vj = flatv // v
    vi = flatv % v

    # World coords (core/obs.py:view_world_coords).
    wx = ax[:, None] + dx[:, None] * (v - 1 - vj) - rx[:, None] * (v // 2 - vi)
    wy = ay[:, None] + dy[:, None] * (v - 1 - vj) - ry[:, None] * (v // 2 - vi)
    inb = (wx >= 0) & (wx < W) & (wy >= 0) & (wy < H)
    flat_idx = jnp.clip(wx, 0, W - 1) * H + jnp.clip(wy, 0, H - 1)

    # One-hot extraction: for each grid cell w, accumulate grid[:, w] into
    # view cells whose index matches.  Unrolled over the (static) W*H cells;
    # every iteration is one [B, VV] select-max.
    cells = jnp.zeros((B, VV), jnp.int32)
    for w in range(W * H):
        cells = jnp.maximum(
            cells, jnp.where(flat_idx == w, grid[:, w][:, None], 0)
        )
    cells = jnp.where(inb, cells, _WALL)

    if stw:
        vis = jnp.ones((B, VV), jnp.int32)
    else:
        t = cells & 0xFF
        st = (cells >> 16) & 0xFF
        opaque = (t == 2) | ((t == OBJ_DOOR) & (st != STATE_OPEN))
        trans = jnp.where(opaque, 0, 1)

        # Bottom-up row sweep (reference grid.py:296-321): per row flood
        # right then left; lit transparent cells light 3 upward neighbors.
        # All masks int32 0/1 (| -> maximum, & -> minimum).
        agent_seed = jnp.where((vi == v // 2) & (vj == v - 1), 1, 0)
        up = jnp.zeros((B, VV), jnp.int32)
        vis = jnp.zeros((B, VV), jnp.int32)
        for j in range(v - 1, -1, -1):
            row = jnp.where(vj == j, 1, 0)
            t_row = jnp.minimum(trans, row)
            m0 = jnp.minimum(agent_seed if j == v - 1 else up, row)
            m_r = jnp.minimum(_flood_right(m0, t_row, vi, v), row)
            cond_r = jnp.minimum(
                jnp.minimum(m_r, t_row), jnp.where(vi < v - 1, 1, 0)
            )
            new_up = jnp.maximum(cond_r, _shift_vi(cond_r, 1, vi))
            m_l = jnp.minimum(_flood_left(m_r, t_row, vi, v), row)
            cond_l = jnp.minimum(jnp.minimum(m_l, t_row), jnp.where(vi > 0, 1, 0))
            new_up = jnp.maximum(
                new_up, jnp.maximum(cond_l, _shift_vi_neg(cond_l, 1, vi, v))
            )
            vis = jnp.maximum(vis, jnp.minimum(m_l, row))
            # Row j-1's lanes sit v positions below row j's in the vj-major
            # flat layout; realign the lit mask for the next iteration (the
            # wraparound lands on row v-1 and is masked off by `row`).
            up = pltpu.roll(new_up, VV - v, axis=1)

    # Agent cell override (core/obs.py:view_and_vis).
    agent_cell_idx = (v - 1) * v + (v // 2)
    has_item = carry != 0
    override = jnp.where(has_item, carry & 0xFFFF, OBJ_EMPTY)
    cells = jnp.where(flatv == agent_cell_idx, override[:, None], cells)

    out_ref[:] = jnp.where(vis > 0, cells, 0)


@partial(jax.jit, static_argnames=("view_size", "see_through_walls", "block", "interpret"))
def fused_obs_packed(
    grid, ax, ay, agent_dir, carrying,
    view_size: int = 7,
    see_through_walls: bool = False,
    block: int = 256,
    interpret: bool = False,
):
    """Packed int32[N, v, v] observation for a batch of packed states.

    ``grid`` int32[N, W, H]; ``ax``/``ay``/``agent_dir``/``carrying``
    int32[N].  Semantics identical to vmapped core/obs.py:gen_obs_image
    before the uint8 unpack (0 encodes unseen).
    """
    N, W, H = grid.shape
    v = view_size
    B = min(block, N)
    assert N % B == 0, f"batch {N} not divisible by block {B}"

    out = pl.pallas_call(
        partial(_kernel, W=W, H=H, v=v, stw=see_through_walls),
        grid=(N // B,),
        in_specs=[
            pl.BlockSpec((B, W * H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, v * v), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, v * v), jnp.int32),
        interpret=interpret,
    )(
        grid.reshape(N, W * H),
        ax.astype(jnp.int32).reshape(N, 1),
        ay.astype(jnp.int32).reshape(N, 1),
        agent_dir.astype(jnp.int32).reshape(N, 1),
        carrying.astype(jnp.int32).reshape(N, 1),
    )
    # vj-major flat -> [vi, vj] view layout used by the rest of the stack.
    return out.reshape(N, v, v).transpose(0, 2, 1)

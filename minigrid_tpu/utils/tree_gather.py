"""Packed leading-axis gather over pytrees.

A per-leaf ``tree.map(lambda a: a[idx], tree)`` issues one TPU gather per
leaf; with the small rows typical of env-state pytrees (a handful of int32
scalars, an 8x8 grid) each gather runs at the hardware's per-row rate and the
op count multiplies the cost (measured 13.7 ms for a 30-leaf, 50 MB level
pool).  ``tree_take`` instead packs every leaf into ONE [N, words] int32
buffer (bitcasting non-int32 dtypes, widening bools), performs a single
gather, and slices the leaves back out — same result, one gather, ~3x faster
on the measured pool.  Used by the pooled BabyAI reset-cache compaction
(envs/babyai/core/level.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def tree_pack(tree):
    """Pack every leaf (shared leading axis N) into ONE [N, words] int32
    buffer; returns ``(packed, meta)`` for :func:`tree_unpack`.  Bool leaves
    widen to int32; other non-int32 dtypes ride as int32 bitcasts (4-byte
    dtypes only).  Splitting pack from gather lets a scan body gather from a
    buffer packed ONCE outside the loop (the per-step reset-cache blend in
    parallel/vector.py — packing per step would re-concatenate every leaf
    every step)."""
    leaves, treedef = jax.tree.flatten(tree)
    assert leaves, "tree_pack: empty tree"
    n = leaves[0].shape[0]
    cols = []
    for leaf in leaves:
        assert leaf.shape[0] == n, "tree_pack: ragged leading axis"
        flat = leaf.reshape(n, -1)
        if flat.dtype == jnp.bool_:
            flat = flat.astype(jnp.int32)
        elif flat.dtype != jnp.int32:
            assert flat.dtype.itemsize == 4, f"tree_pack: {flat.dtype} leaf"
            flat = jax.lax.bitcast_convert_type(flat, jnp.int32)
        cols.append(flat)
    meta = (treedef, [(leaf.dtype, leaf.shape[1:]) for leaf in leaves])
    return jnp.concatenate(cols, axis=1), meta


def tree_unpack(rows: jnp.ndarray, meta):
    """Inverse of :func:`tree_pack` on gathered rows [M, words]."""
    treedef, specs = meta
    out, o = [], 0
    for dtype, shape in specs:
        w = math.prod(shape)
        chunk = rows[:, o : o + w]
        o += w
        if dtype == jnp.bool_:
            chunk = chunk != 0
        elif dtype != jnp.int32:
            chunk = jax.lax.bitcast_convert_type(chunk, dtype)
        out.append(chunk.reshape((rows.shape[0],) + tuple(shape)))
    return jax.tree.unflatten(treedef, out)


def tree_take(tree, idx: jnp.ndarray):
    """``jax.tree.map(lambda a: a[idx], tree)`` via one packed gather.

    Every leaf must share the same leading axis length; ``idx`` is an int32
    index vector into that axis.  Bool leaves are widened to int32 for the
    packed buffer and narrowed back; other non-int32 dtypes ride as int32
    bitcasts (4-byte dtypes only).
    """
    leaves, _ = jax.tree.flatten(tree)
    if not leaves:
        return tree
    packed, meta = tree_pack(tree)
    return tree_unpack(packed[idx], meta)


def compact_valid_indices(valid: jnp.ndarray, total: int) -> jnp.ndarray:
    """int32[total] indices of the valid entries of bool[N] ``valid`` in
    order, wrapping around when fewer than ``total`` are valid.

    Equivalent to ``jnp.argsort(~valid)[jnp.arange(total) % nvalid]`` (stable
    sort puts valid indices first, in order) but built from a cumsum + one
    tiny scatter instead of a full bitonic argsort.
    """
    n = valid.shape[0]
    vi = valid.astype(jnp.int32)
    nvalid = jnp.maximum(vi.sum(), 1)
    # The drop sentinel must be out of bounds for the [total]-length scatter
    # target, not just for [n]: with total > n a sentinel of ``n`` would be a
    # VALID index and every invalid entry would scatter-collide there.
    oob = max(n, total)
    dest = jnp.where(valid, jnp.cumsum(vi) - 1, oob)  # invalid -> OOB, dropped
    first = jnp.zeros((total,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    return first[jnp.arange(total) % nvalid]

"""Memory-bounded vmap: apply ``vmap(fn)`` over a large leading axis in
sequential ``lax.map`` chunks.

Level-pool generation vmaps a full maze generator over ``num_envs * R *
pool_factor`` lanes; on big grids the generator's per-lane intermediates
(one-hot placement masks, room lattices, rank scans over W*H cells) make the
one-shot vmap's peak footprint proportional to ``lanes * cells`` — measured
26.15 GB for BabyAI-GoTo's 229k-lane x 484-cell pool, past the v5e's
15.75 GB HBM.  Chunking bounds the live intermediates to one chunk while
leaving results bit-identical: lane i still runs ``fn`` on exactly the same
input as the one-shot vmap (the pad lanes appended to fill the last chunk are
computed and discarded), so distribution/parity tests are unaffected by the
chunk size.  Scope: bit-exactness holds for the integer programs the
generators are made of; float chains can drift by an ulp where XLA's FMA
contraction or libm vectorization depends on batch width (tests pin both
halves of this contract).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Peak generator intermediates scale ~linearly in lanes * grid cells
# (~120 KB per 484-cell lane measured on the GoTo pool); one chunk is capped
# at this many cell-lanes so generation stays under ~25% of HBM.
CELL_LANE_BUDGET = 1 << 25


def lane_cap(cells: int) -> int:
    """Max lanes per chunk for a ``cells``-cell grid (multiple of 1024)."""
    return max(1024, (CELL_LANE_BUDGET // max(int(cells), 1)) // 1024 * 1024)


def chunked_vmap(fn, xs, max_lanes: int | None):
    """``jax.vmap(fn)(xs)`` evaluated in sequential chunks of ``max_lanes``.

    ``xs`` is a pytree whose leaves share leading axis N; ``fn`` maps one
    lane's pytree slice to an output pytree.  With ``max_lanes`` of None (or
    ``>= N``) this IS ``jax.vmap(fn)(xs)``; otherwise the lanes run in
    ``ceil(N / max_lanes)`` chunks under ``lax.map``, the last chunk padded
    by recomputing leading lanes whose outputs are dropped.  Per-lane outputs
    are bit-identical either way.
    """
    n = jax.tree.leaves(xs)[0].shape[0]
    if max_lanes is None or n <= max_lanes:
        return jax.vmap(fn)(xs)
    c = -(-n // max_lanes)
    pad = c * max_lanes - n
    if pad:
        xs = jax.tree.map(lambda a: jnp.concatenate([a, a[:pad]], axis=0), xs)
    xs = jax.tree.map(
        lambda a: a.reshape((c, max_lanes) + a.shape[1:]), xs
    )
    outs = jax.lax.map(jax.vmap(fn), xs)
    return jax.tree.map(
        lambda a: a.reshape((c * max_lanes,) + a.shape[2:])[:n], outs
    )

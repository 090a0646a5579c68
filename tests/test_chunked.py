"""utils/chunked: memory-bounded vmap must match plain vmap per lane.

The pooled level generators route through chunked_vmap so big-grid pools
(BabyAI-GoTo's 229k-lane x 484-cell pool measured 26.15 GB one-shot, past
the v5e's 15.75 GB HBM) generate in sequential lax.map chunks.  The contract
pinned here: integer lanes (what the generators are made of — packed int32
grids, count-and-rank draws, threefry counters) are BIT-exact at any chunk
size, including the recompute-padded last chunk; float lanes may drift by
an ulp where XLA's FMA contraction / libm vectorization depends on batch
width (observed: ``uniform()*3-1`` contracts to FMA at some widths only).
"""

import jax
import jax.numpy as jnp

import minigrid_tpu as mg
import minigrid_tpu.utils.chunked as ch
from minigrid_tpu.utils.chunked import chunked_vmap


def _f(k):
    return (
        jax.random.uniform(k, (5,)) * 3.0 - 1.0,
        jax.random.randint(k, (3,), 0, 100),
        jax.random.uniform(k) > 0.5,
    )


def test_chunked_vmap_matches_vmap():
    keys = jax.random.split(jax.random.PRNGKey(3), 37)
    ref = jax.vmap(_f)(keys)
    for cap in (1, 4, 8, 36, 37, 64, None):
        out = chunked_vmap(_f, keys, cap)
        for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
            assert a.dtype == b.dtype
            if jnp.issubdtype(a.dtype, jnp.floating):
                # batch-width-dependent FMA contraction: <= 1 ulp
                ulp = jnp.spacing(jnp.abs(a).astype(a.dtype))
                assert (jnp.abs(a - b) <= ulp).all(), f"cap={cap}"
            else:
                assert (a == b).all(), f"cap={cap}"


def test_chunked_vmap_integer_bit_exact_pytree_args():
    keys = jax.random.split(jax.random.PRNGKey(5), 13)
    xs = (keys, jnp.arange(13, dtype=jnp.int32))
    f = lambda t: jax.random.randint(t[0], (4,), 0, 1000) + t[1]
    ref = jax.vmap(f)(xs)
    assert (chunked_vmap(f, xs, 5) == ref).all()


def test_pooled_cache_invariant_to_chunking(monkeypatch):
    """batch_reset_cache produces the same cache whatever the chunk budget."""
    env = mg.make("BabyAI-GoToLocal-v0")
    k = jax.random.PRNGKey(0)
    ref = env.batch_reset_cache(k, 8, 2)
    # The production floor is 1024 lanes; force chunking at this test's tiny
    # pool (8 envs x 2 resets x pool_factor) by shrinking the cap itself.
    monkeypatch.setattr(ch, "lane_cap", lambda cells: 7)
    out = env.batch_reset_cache(k, 8, 2)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        assert (a == b).all()

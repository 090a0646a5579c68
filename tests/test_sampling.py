"""Placement sampling + pooled-cache compaction primitives.

Covers the count-and-rank masked-uniform draw (core/sampling.py) that
replaced the masked-Gumbel categorical — the distribution contract is the
reference's rejection loop conditioned on acceptance (uniform over free
cells, minigrid/minigrid_env.py:339-364) — and the packed-gather compaction
(utils/tree_gather.py) used by the pooled BabyAI reset cache, which must be
bit-identical to the stable-argsort form it replaced.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minigrid_tpu.core.sampling import masked_uniform_index, sample_mask_cell
from minigrid_tpu.utils.tree_gather import compact_valid_indices, tree_take


def test_masked_uniform_is_uniform_over_set_bits():
    mask = jnp.asarray(
        np.array([0, 1, 0, 0, 1, 1, 0, 1, 0, 0, 0, 1], dtype=bool)
    )
    draws = jax.vmap(lambda k: masked_uniform_index(k, mask))(
        jax.random.split(jax.random.PRNGKey(0), 6000)
    )
    counts = np.bincount(np.asarray(draws), minlength=mask.shape[0])
    # Only set bits are ever drawn.
    assert (counts[~np.asarray(mask)] == 0).all()
    hit = counts[np.asarray(mask)]
    expected = 6000 / int(mask.sum())
    # 5 sigma on a binomial(6000, 1/5) count.
    assert (np.abs(hit - expected) < 5 * np.sqrt(expected)).all()


def test_masked_uniform_all_false_returns_zero():
    idx = masked_uniform_index(jax.random.PRNGKey(1), jnp.zeros((9,), bool))
    assert int(idx) == 0


def test_sample_mask_cell_coords():
    mask = jnp.zeros((5, 7), bool).at[3, 2].set(True)
    pos = sample_mask_cell(jax.random.PRNGKey(2), mask)
    assert pos.tolist() == [3, 2]


@pytest.mark.parametrize("nvalid_frac", [0.3, 0.9, 1.0])
def test_compact_valid_indices_matches_argsort(nvalid_frac):
    n, total = 257, 101
    rng = np.random.default_rng(7)
    valid = jnp.asarray(rng.random(n) < nvalid_frac)
    ref = jnp.argsort(~valid)[
        jnp.arange(total) % jnp.maximum(valid.sum(), 1)
    ]
    got = compact_valid_indices(valid, total)
    assert (got == ref).all()


def test_compact_valid_indices_none_valid():
    got = compact_valid_indices(jnp.zeros((13,), bool), 5)
    assert (got == 0).all()


def test_tree_take_matches_per_leaf_gather():
    rng = np.random.default_rng(3)
    tree = {
        "grid": jnp.asarray(rng.integers(0, 99, (17, 4, 4), dtype=np.int32)),
        "flag": jnp.asarray(rng.random(17) < 0.5),
        "f": jnp.asarray(rng.random((17, 3), dtype=np.float32)),
        "scalar": jnp.asarray(rng.integers(-5, 5, 17, dtype=np.int32)),
    }
    idx = jnp.asarray([3, 0, 16, 3, 7], jnp.int32)
    got = tree_take(tree, idx)
    want = jax.tree.map(lambda a: a[idx], tree)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        assert g.dtype == w.dtype and g.shape == w.shape
        assert (g == w).all()


def test_flat_reset_pool_cache_matches_nested_structure():
    """The flat-pool reset cache (core/env.py flat_reset_pool) must produce
    a cache with exactly the nested form's pytree structure, shapes and
    dtypes — consumers (fused kernels, step_cached, shard_map collectors)
    see no difference beyond which iid levels were drawn."""
    import minigrid_tpu as mg

    env = mg.make("MiniGrid-LavaCrossingS9N2-v0")
    assert env.flat_reset_pool
    key = jax.random.PRNGKey(5)
    flat = env.batch_reset_cache(key, 4, 2)
    nested = jax.vmap(env.reset_cache, in_axes=(0, None))(
        jax.random.split(key, 4), 2
    )
    assert jax.tree.structure(flat) == jax.tree.structure(nested)
    for a, b in zip(jax.tree.leaves(flat), jax.tree.leaves(nested)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # Levels are fresh and well-formed: every slot has a goal cell.
    from minigrid_tpu.core.constants import OBJ_GOAL, cell_type

    assert bool((cell_type(flat.grid) == OBJ_GOAL).any(axis=(-1, -2)).all())

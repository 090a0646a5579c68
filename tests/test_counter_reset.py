"""Distribution parity of the in-kernel counter-reset generators.

``covers_reset`` families (ops/fused_ext.reset_block) regenerate fresh
episodes inside the fused kernels from a counter-based stream instead of
drawing from a pre-generated cache.  Kernel-vs-XLA bit-exactness of that
stream is covered by tests/test_fused_rollout.py (shared trace); what THIS
file pins is the other half of the contract: the counter generator must
produce the same LEVEL DISTRIBUTION as the family's ``_generate`` (which the
seed-parity suite ties to the reference's rejection-sampling semantics,
reference: minigrid/minigrid_env.py:313-372).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg


def _counter_states(env, n):
    ext = env.fused_ext
    seeds = jax.random.bits(jax.random.PRNGKey(5), (n, 2), jnp.uint32).astype(
        jnp.int32
    )
    # Spread across episode ordinals too (the stream must be iid in BOTH
    # the seed and the ordinal).
    eps = jnp.arange(n, dtype=jnp.int32) % 7
    return jax.jit(
        jax.vmap(lambda s, e: ext.reset_state(env, s[0], s[1], e))
    )(seeds, eps)


def _generate_states(env, n):
    return jax.jit(jax.vmap(env._generate))(
        jax.random.split(jax.random.PRNGKey(9), n)
    )


def _assert_close_freq(counts_a, counts_b, n, rel=0.25, floor=0.01):
    """Per-bin relative frequency comparison with a small absolute floor."""
    fa, fb = counts_a / n, counts_b / n
    mask = (fa > floor) | (fb > floor)
    diff = np.abs(fa - fb)
    tol = rel * np.maximum(fa, fb) + 3.0 * np.sqrt(
        np.maximum(fa, fb) * (1 - np.minimum(fa, fb)) / n
    )
    bad = mask & (diff > tol)
    assert not bad.any(), (
        f"frequency mismatch at bins {np.nonzero(bad)}: "
        f"{fa[bad]} vs {fb[bad]}"
    )


def test_empty_random_agent_distribution():
    env = mg.make("MiniGrid-Empty-Random-5x5-v0")
    n = 4096
    a = _counter_states(env, n)
    b = _generate_states(env, n)
    # Identical support and close frequencies over (x, y, dir).
    for st in (a, b):
        x, y = np.asarray(st.agent_x), np.asarray(st.agent_y)
        assert ((x >= 1) & (x <= 3) & (y >= 1) & (y <= 3)).all()
        assert not ((x == 3) & (y == 3)).any()  # never on the goal
    bins_a = np.bincount(
        np.asarray(a.agent_x) * 20 + np.asarray(a.agent_y) * 4
        + np.asarray(a.agent_dir),
        minlength=100,
    )
    bins_b = np.bincount(
        np.asarray(b.agent_x) * 20 + np.asarray(b.agent_y) * 4
        + np.asarray(b.agent_dir),
        minlength=100,
    )
    assert (bins_a > 0).sum() == (bins_b > 0).sum() == 8 * 4
    _assert_close_freq(bins_a.astype(float), bins_b.astype(float), n)


def test_dynamic_obstacles_distribution():
    env = mg.make("MiniGrid-Dynamic-Obstacles-8x8-v0")
    n = 4096
    a = _counter_states(env, n)
    b = _generate_states(env, n)
    from minigrid_tpu.envs.dynamicobstacles import BALL_CELL

    ball = int(BALL_CELL)
    for st in (a, b):
        grids = np.asarray(st.grid)
        # Exactly n_obstacles balls, never on the agent or the goal.
        n_balls = (grids == ball).sum(axis=(1, 2))
        assert (n_balls == env.n_obstacles).all()
        assert not (grids[:, 1, 1] == ball).any()
        assert not (grids[:, 6, 6] == ball).any()
        # Obstacle scalars agree with the grid.
        obst = np.asarray(st.extra["obstacles"])
        for i in range(env.n_obstacles):
            cells = grids[np.arange(n), obst[:, i, 0], obst[:, i, 1]]
            assert (cells == ball).all()
    occ_a = (np.asarray(a.grid) == ball).sum(axis=0).reshape(-1).astype(float)
    occ_b = (np.asarray(b.grid) == ball).sum(axis=0).reshape(-1).astype(float)
    _assert_close_freq(occ_a, occ_b, n)
    # Walk seeds must be (essentially) unique per episode — the walk stream
    # is iid across resets.
    ws = np.asarray(a.extra["walk_seed"])
    assert len(np.unique(ws[:, 0])) > n * 0.99


def test_counter_reset_deterministic_in_seed_and_ordinal():
    env = mg.make("MiniGrid-Empty-Random-5x5-v0")
    ext = env.fused_ext
    s0, s1 = jnp.int32(123), jnp.int32(456)
    a = ext.reset_state(env, s0, s1, jnp.int32(3))
    b = ext.reset_state(env, s0, s1, jnp.int32(3))
    assert int(a.agent_x) == int(b.agent_x)
    assert int(a.agent_dir) == int(b.agent_dir)
    # Different ordinals decorrelate (checked in aggregate).
    xs = {
        (int(ext.reset_state(env, s0, s1, jnp.int32(e)).agent_x),
         int(ext.reset_state(env, s0, s1, jnp.int32(e)).agent_y))
        for e in range(12)
    }
    assert len(xs) > 2


@pytest.mark.parametrize(
    "env_id",
    ["MiniGrid-Empty-Random-5x5-v0", "MiniGrid-Dynamic-Obstacles-8x8-v0"],
)
def test_covers_reset_families_declare_it(env_id):
    env = mg.make(env_id)
    assert getattr(env.fused_ext, "covers_reset", False)
    assert not env.deterministic_generation


def test_crossing_distribution():
    """The in-kernel Crossing generator (river selection, path shuffle,
    openings) matches _generate's level distribution: identical support and
    close per-cell obstacle/opening frequencies."""
    env = mg.make("MiniGrid-LavaCrossingS9N2-v0")
    n = 4096
    a = _counter_states(env, n)
    b = _generate_states(env, n)
    from minigrid_tpu.core.constants import LAVA_CELL

    lava = int(LAVA_CELL)
    occ_a = (np.asarray(a.grid) == lava).astype(float)
    occ_b = (np.asarray(b.grid) == lava).astype(float)
    # Same per-level lava budget distribution (rivers minus openings).
    tot_a = occ_a.sum(axis=(1, 2))
    tot_b = occ_b.sum(axis=(1, 2))
    assert set(np.unique(tot_a)) == set(np.unique(tot_b))
    np.testing.assert_allclose(tot_a.mean(), tot_b.mean(), rtol=0.03)
    # Per-cell river-occupancy frequencies.
    _assert_close_freq(
        occ_a.sum(axis=0).reshape(-1), occ_b.sum(axis=0).reshape(-1), n
    )
    # Levels must stay solvable: start and goal cells are intact.
    for st in (a, b):
        grids = np.asarray(st.grid)
        assert (grids[:, 1, 1] != lava).all()
        assert ((grids[:, 7, 7] & 0xFF) == 8).all()  # OBJ_GOAL

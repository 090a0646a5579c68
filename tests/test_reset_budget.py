"""Honest reset-cache semantics (parallel/reset_budget).

The reference generates a FRESH level on every episode end, unconditionally
(reference: minigrid/minigrid_env.py:119-143).  The batched paths amortize
via a per-chunk cache of R levels; these tests pin the covering contract:

* ``deterministic_generation`` families really are key-independent (their
  R=1 exemption is exact, not asserted);
* every bench config's measured episode rate stays within its covering R
  (the full-scale certification runs inside bench.py itself via
  ``assert_chain_covered`` — this is the default-lane guard);
* exhaustion is DETECTED: ``max_used`` reports over-consumption and
  ``assert_chain_covered`` fails on it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.parallel.reset_budget import (
    MEASURED_MAX_EPISODES_256,
    assert_chain_covered,
    covering_resets,
    resets_for,
)
from minigrid_tpu.parallel.vector import rollout_random

DETERMINISTIC_IDS = [
    "MiniGrid-Empty-5x5-v0",
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-Empty-16x16-v0",
    "MiniGrid-DistShift1-v0",
    "MiniGrid-DistShift2-v0",
]

NON_RNG_FIELDS = [
    "grid",
    "contains",
    "agent_x",
    "agent_y",
    "agent_dir",
    "carrying",
    "step_count",
    "max_steps",
    "terminated",
    "truncated",
    "mission",
]


@pytest.mark.parametrize("env_id", DETERMINISTIC_IDS)
def test_deterministic_generation_is_key_independent(env_id):
    env = mg.make(env_id)
    assert env.deterministic_generation
    a = jax.jit(env._generate)(jax.random.PRNGKey(0))
    b = jax.jit(env._generate)(jax.random.PRNGKey(12345))
    for name in NON_RNG_FIELDS:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)),
            np.asarray(getattr(b, name)),
            err_msg=f"{env_id}: {name} varies with the key",
        )


def test_random_start_empty_is_not_flagged():
    env = mg.make("MiniGrid-Empty-Random-5x5-v0")
    assert not env.deterministic_generation
    # ... and really does vary (guards against a wrongly-set flag upstream).
    gen = jax.jit(jax.vmap(env._generate))
    states = gen(jax.random.split(jax.random.PRNGKey(0), 64))
    pos = np.asarray(states.agent_x) * 100 + np.asarray(states.agent_y)
    assert len(np.unique(pos)) > 1


def test_resets_for_contract():
    e = mg.make("MiniGrid-Empty-8x8-v0")
    assert resets_for(e, 256) == 1  # deterministic: replay IS fresh
    d = mg.make("MiniGrid-Dynamic-Obstacles-8x8-v0")
    r256 = resets_for(d, 256)
    measured = MEASURED_MAX_EPISODES_256["MiniGrid-Dynamic-Obstacles-8x8-v0"]
    assert r256 > measured  # strictly above the observed maximum
    assert resets_for(d, 512) >= r256  # scales with the chunk length
    assert covering_resets(4, 128) == 2 + 2  # ceil(4*128/256)=2, +max(1,2)


@pytest.mark.parametrize(
    "env_id,num_envs",
    [
        ("MiniGrid-Empty-Random-5x5-v0", 256),
        ("MiniGrid-LavaCrossingS9N2-v0", 256),
        ("MiniGrid-Dynamic-Obstacles-8x8-v0", 256),
        ("BabyAI-GoToLocal-v0", 128),
    ],
)
def test_bench_config_episode_rate_within_budget(env_id, num_envs):
    """Default-lane guard: at CPU-affordable scale, a chained chunk's
    consumed reset budget stays within the capacity the rollout path
    enforces (per-env covering R on the fused path, shared-pool size on the
    XLA cached path).  (The full-scale certification runs in bench.py on
    the chip — assert_chain_covered on the very step being timed.)"""
    from minigrid_tpu.parallel.vector import rollout_capacity

    env = mg.make(env_id)
    num_steps = 256
    resets = resets_for(env, num_steps, env_id)
    capacity = rollout_capacity(env, num_envs, num_steps, env_id)
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, num_envs))

    def step(c):
        st, kk = c
        kk, kr = jax.random.split(kk)
        st, r, d, mu = rollout_random(env, st, kr, num_steps, resets)
        return (st, kk), (r, d, mu)

    observed = assert_chain_covered(step, (states, k2), capacity, env, chunks=2)
    assert observed <= capacity


def test_exhaustion_is_detected_not_silent():
    """Force exhaustion (tiny max_steps, R=2): max_used must report the
    over-consumption and assert_chain_covered must fail loudly."""
    env = mg.make("MiniGrid-LavaCrossingS9N2-v0", max_steps=4)
    key = jax.random.PRNGKey(0)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, 32))
    _, _, done, mu = rollout_random(env, states, key, 32, 2)
    # 32 steps at max_steps=4 -> ~8 episodes per env; R=2 is exhausted.
    assert int(mu) > 2
    assert int(done) >= 32 // 4 * 32 // 2

    def step(c):
        st, kk = c
        kk, kr = jax.random.split(kk)
        st, r, d, mu = rollout_random(env, st, kr, 32, 2)
        return (st, kk), (r, d, mu)

    with pytest.raises(AssertionError, match="reset cache exhausted"):
        assert_chain_covered(step, (states, key), 2, env, chunks=1)


def test_deterministic_family_exempt_from_chain_check():
    env = mg.make("MiniGrid-Empty-8x8-v0", max_steps=4)  # rapid truncation
    key = jax.random.PRNGKey(0)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, 32))

    def step(c):
        st, kk = c
        kk, kr = jax.random.split(kk)
        st, r, d, mu = rollout_random(env, st, kr, 16, 1)
        return (st, kk), (r, d, mu)

    # R=1 with many truncations: exempt because every fresh level is equal.
    assert assert_chain_covered(step, (states, key), 1, env, chunks=1) == 0


def test_pool_stepper_consumes_one_fresh_level_per_episode():
    """Shared-pool path (make_pool_stepper): every episode end consumes
    exactly one pool row (consumed == episodes finished), within the
    aggregate-sized pool — the iid fresh-reset contract at aggregate cost."""
    from minigrid_tpu.parallel.reset_budget import pool_size
    from minigrid_tpu.parallel.vector import rollout_random

    env = mg.make("BabyAI-GoToLocal-v0")
    n, t = 64, 128
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    _, _, done, consumed = rollout_random(env, states, k2, t, None, False)
    assert int(done) > 0, "no episodes exercised"
    assert int(consumed) == int(done)
    assert int(consumed) <= pool_size(env, t, n, "BabyAI-GoToLocal-v0")


def test_pool_stepper_draws_distinct_rows_in_order():
    """The pool rows blended in on episode ends are consecutive DISTINCT
    rows: stepping two envs that finish on different steps must hand them
    different pool levels (no sticky-slot replay across envs)."""
    from minigrid_tpu.parallel.vector import batch_reset_pool, make_pool_stepper

    env = mg.make("MiniGrid-LavaCrossingS9N2-v0", max_steps=2)
    n = 4
    key = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    pool = batch_reset_pool(env, k2, 16)
    step = jax.jit(make_pool_stepper(env, pool, n))
    consumed = jnp.zeros((), jnp.int32)
    actions = jnp.zeros((n,), jnp.int32)  # turn in place until truncation
    for _ in range(2):
        states, _, _, trunc, consumed = step(states, actions, consumed)
    assert bool(trunc.all()) and int(consumed) == n
    # Each env received pool row = its rank among that step's finishers.
    for i in range(n):
        expect = jax.tree.map(lambda a: a[i], pool)
        got = jax.tree.map(lambda a: a[i], states)
        np.testing.assert_array_equal(
            np.asarray(expect.grid), np.asarray(got.grid)
        )


def test_learner_metrics_surface_episode_rate():
    from minigrid_tpu.rl.ppo import PPOConfig, make_ppo

    env = mg.make("MiniGrid-Empty-8x8-v0")
    init_fn, train_step = make_ppo(
        env, PPOConfig(rollout_steps=8, num_minibatches=2), hidden=32
    )
    state = init_fn(jax.random.PRNGKey(0), 16)
    _, metrics = jax.jit(train_step)(state)
    assert "max_episodes_per_chunk" in metrics
    assert int(metrics["max_episodes_per_chunk"]) >= 0


@pytest.mark.parametrize(
    "env_id", ["BabyAI-GoToLocal-v0", "MiniGrid-LavaCrossingS9N2-v0"]
)
def test_packed_gather_stepper_matches_step_cached(env_id):
    """make_cached_stepper (one packed gather per step, R-independent HLO)
    must reproduce ``jax.vmap(env.step_cached)`` bit-exactly — same cache,
    same actions, every field including ``extra`` and the rng blend."""
    from minigrid_tpu.parallel.vector import make_cached_stepper

    env = mg.make(env_id)
    n, r, t = 64, 5, 40
    key = jax.random.PRNGKey(4)
    k1, k2, k3 = jax.random.split(key, 3)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    cache = env.batch_reset_cache(k2, n, r)
    actions = jax.random.randint(k3, (t, n), 0, env.num_actions, jnp.int32)

    step_g = jax.jit(make_cached_stepper(env, cache, n))
    step_v = jax.jit(jax.vmap(env.step_cached))

    sg, ug = states, jnp.zeros((n,), jnp.int32)
    sv, uv = states, jnp.zeros((n,), jnp.int32)
    for i in range(t):
        sg, rg, tg, cg, ug = step_g(sg, actions[i], ug)
        _, sv, rv, tv, cv, uv = step_v(sv, actions[i], cache, uv)
    assert int(ug.max()) > 0, "no resets exercised"
    np.testing.assert_array_equal(np.asarray(ug), np.asarray(uv))
    for la, lb in zip(jax.tree.leaves(sg), jax.tree.leaves(sv)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

"""Distribution-layer tests on the virtual 8-device CPU mesh (SURVEY.md §4:
fake-device meshes are the distributed test strategy)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    sharded_reset,
    sharded_rollout,
)
from minigrid_tpu.parallel.vector import VectorEnv, rollout_random


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_sharded_rollout_matches_single_device():
    """The mesh-sharded rollout computes exactly what the unsharded one does
    (SPMD partitioning must not change semantics)."""
    env = mg.make("MiniGrid-Empty-5x5-v0")
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    num_envs = 32

    _, states_sh = sharded_reset(env, mesh, key, num_envs)
    states_local = jax.jit(jax.vmap(env.reset))(jax.random.split(key, num_envs))[1]

    out_sh, r_sh, d_sh, _ = sharded_rollout(env, mesh, states_sh, key, 40)
    out_l, r_l, d_l, _ = rollout_random(env, states_local, key, 40)

    np.testing.assert_array_equal(np.asarray(out_sh.grid), np.asarray(out_l.grid))
    np.testing.assert_array_equal(
        np.asarray(out_sh.step_count), np.asarray(out_l.step_count)
    )
    assert float(r_sh) == pytest.approx(float(r_l))
    assert int(d_sh) == int(d_l)


def test_sharded_rollout_expensive_reset_family():
    env = mg.make("MiniGrid-KeyCorridorS3R1-v0")
    mesh = make_mesh()
    key = jax.random.PRNGKey(1)
    _, states = sharded_reset(env, mesh, key, 16)
    out, total_r, done, _ = sharded_rollout(env, mesh, states, key, 30)
    assert out.step_count.shape == (16,)
    assert int(done) >= 0


def test_shard_and_replicate_placement():
    mesh = make_mesh()
    x = jnp.arange(64.0).reshape(8, 8)
    xs = shard_batch(mesh, x)
    xr = replicate(mesh, x)
    assert len(xs.sharding.device_set) == 8
    assert not xs.sharding.is_fully_replicated
    assert xr.sharding.is_fully_replicated


def test_ppo_trains_on_mesh():
    """One PPO step sharded over the mesh improves nothing in particular but
    must produce finite losses and keep shardings stable (the dryrun
    contract, __graft_entry__.dryrun_multichip)."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_vector_env_api():
    env = mg.make("MiniGrid-Empty-5x5-v0")
    venv = VectorEnv(env, 6)
    obs, states = venv.reset(jax.random.PRNGKey(0))
    assert obs["image"].shape == (6, 7, 7, 3)
    obs, states, r, te, tr = venv.step(states, jnp.zeros((6,), jnp.int32))
    assert r.shape == (6,)


def test_impala_trains_on_mesh():
    """One IMPALA (V-trace) step over the 8-device mesh: finite losses, env
    batch stays sharded through the windowed time-slice update (same SPMD
    contract as the PPO dryrun)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minigrid_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from minigrid_tpu.rl.impala import IMPALAConfig, TrainState, make_impala

    env = mg.make("MiniGrid-Empty-5x5-v0")
    mesh = make_mesh()
    init_fn, train_step = make_impala(
        env, IMPALAConfig(rollout_steps=16, num_minibatches=4, update_epochs=2),
        hidden=32,
    )
    state = init_fn(jax.random.PRNGKey(0), num_envs=64)
    state = TrainState(
        replicate(mesh, state.params),
        replicate(mesh, state.opt_state),
        shard_batch(mesh, state.env_states),
        replicate(mesh, state.key),
    )
    step = jax.jit(train_step)
    state, metrics = step(state)
    assert bool(jnp.isfinite(metrics["pg_loss"]))
    assert bool(jnp.isfinite(metrics["value_loss"]))
    env_shard = state.env_states.step_count.sharding
    assert env_shard.is_equivalent_to(
        NamedSharding(mesh, P("data")), ndim=1
    )

"""shard_map rollout paths on the 8-virtual-device CPU mesh.

XLA's SPMD partitioner cannot partition a custom call, so on a multi-chip
mesh the fused Pallas kernels are reachable only through ``shard_map``
(each device runs the kernel on its local env shard).  These tests drive
that wiring end to end on the virtual mesh: the per-shard body here runs
the XLA scan (CPU backend), but the sharding contract — per-shard key
folding, psum'd totals, env-axis-sharded trajectories feeding the
partitioner-handled update — is exactly what executes on a pod.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

import minigrid_tpu as mg
from minigrid_tpu.parallel.mesh import make_mesh, shard_batch, sharded_rollout_fused


def test_sharded_rollout_fused_xla_fallback_matches_manual():
    env = mg.make("MiniGrid-Empty-8x8-v0", max_steps=12)
    mesh = make_mesh()
    n = 8 * mesh.devices.size
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    states = shard_batch(mesh, states)

    final, total_r, total_done = sharded_rollout_fused(env, mesh, states, k2, 32)
    assert final.step_count.shape == (n,)
    assert int(total_done) > 0  # max_steps=12 < 32 forces resets

    # Per-shard determinism: the same call reproduces identical results.
    final2, total_r2, total_done2 = sharded_rollout_fused(env, mesh, states, k2, 32)
    np.testing.assert_array_equal(
        np.asarray(final.grid), np.asarray(final2.grid)
    )
    assert float(total_r) == float(total_r2)
    assert int(total_done) == int(total_done2)

    # Manual replica of the shard_map body: same per-shard key folding and
    # rollout on each local slice must reproduce the totals exactly.
    from minigrid_tpu.parallel.vector import rollout_random

    d = mesh.devices.size
    per = n // d
    tr, td = 0.0, 0
    for i in range(d):
        local = jax.tree.map(lambda a: a[i * per : (i + 1) * per], states)
        k = jax.random.fold_in(k2, i)
        _, r, dn = jax.jit(
            lambda s, k: rollout_random(env, s, k, 32, 2, False)
        )(local, k)
        tr += float(r)
        td += int(dn)
    np.testing.assert_allclose(float(total_r), tr, rtol=1e-5)
    assert int(total_done) == td


def test_ppo_train_step_with_mesh_rollout():
    """Full PPO train step with the shard_map rollout inside: sharded env
    batch in, replicated params, finite losses out."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from minigrid_tpu.rl.ppo import PPOConfig, TrainState, make_ppo

    mesh = make_mesh()
    env = mg.make("MiniGrid-Empty-8x8-v0")
    config = PPOConfig(rollout_steps=4, num_minibatches=2)
    init_fn, train_step = make_ppo(env, config, hidden=32, mesh=mesh)

    n = 2 * mesh.devices.size
    state = init_fn(jax.random.PRNGKey(3), n)
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    state = TrainState(
        params=jax.device_put(state.params, repl),
        opt_state=jax.device_put(state.opt_state, repl),
        env_states=jax.device_put(state.env_states, shard),
        key=jax.device_put(state.key, repl),
    )
    step = jax.jit(train_step)
    for _ in range(2):
        state, metrics = step(state)
    assert bool(jnp.isfinite(metrics["pg_loss"]))
    assert bool(jnp.isfinite(metrics["value_loss"]))
    # env batch stayed sharded through the update
    assert state.env_states.step_count.shape == (n,)

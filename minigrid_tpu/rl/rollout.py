"""Shared on-device trajectory collection for the RL learners.

One ``lax.scan`` over time with auto-reset fused (or the per-chunk reset
cache for expensive-reset families); used by both the PPO and IMPALA
learners.  Trajectories are stored time-major with the observation as the
PACKED int32 [T, N, v*v] view (core/obs.gen_obs_packed): a stacked
[T, N, 7, 7, 3] uint8 tensor tiles its (7, 3) minor dims to (32, 128) on
TPU — a huge physical blowup written every rollout — while the packed form
is a flat, fully lane-utilized int32 plane that also skips the
uint8<->int32 unpack/repack round-trip in the update (rl/model.py
embed_obs_packed produces bit-identical features).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Trajectory(NamedTuple):
    obs: jnp.ndarray  # int32[T, N, v*v] packed view
    direction: jnp.ndarray  # int32[T, N]
    action: jnp.ndarray  # int32[T, N]
    logp: jnp.ndarray  # f32[T, N] — behavior-policy log prob
    value: jnp.ndarray  # f32[T, N]
    reward: jnp.ndarray  # f32[T, N]
    done: jnp.ndarray  # bool[T, N]


def collect_trajectory(
    env,
    policy_apply,
    params,
    env_states,
    key: jax.Array,
    rollout_steps: int,
    resets_per_chunk: int | None = None,
    fused_actor: bool = False,
    mesh=None,
    axis_name: str = "data",
    kernel_interpret: bool = False,
):
    """Scan ``rollout_steps`` policy steps; returns (env_states, key, Trajectory).

    ``policy_apply(params, packed_obs, direction)`` consumes the packed
    int32 [N, v*v] observation.

    ``fused_actor=True`` (set by the learners, whose ``policy_apply`` IS the
    standard ActorCritic packed forward) routes eligible configurations
    through the whole-collection Pallas kernel (ops/actor_rollout.py): the
    env state, reset cache and actor weights stay VMEM-resident across all
    ``rollout_steps`` and the per-step policy matmuls run on the MXU inside
    the kernel; only the trajectory streams to HBM.  Same step_cached
    semantics; action sampling is the same Gumbel-argmax construction as
    ``jax.random.categorical``, driven from the key stream.

    ``mesh`` (a 1-D ``jax.sharding.Mesh``) runs the collection under
    ``shard_map``: each device collects its local env shard — through the
    fused kernel when eligible per shard, which the plain jit path cannot
    reach on a multi-chip mesh (XLA's SPMD partitioner does not partition
    custom calls) — and the trajectory comes back sharded on the env axis
    for the (partitioner-handled) update that follows.
    """
    num_envs = env_states.step_count.shape[0]
    if resets_per_chunk is None:
        # Covering cache size for honest iid resets (an undersized cache
        # replays its last level past exhaustion — see parallel/reset_budget).
        from minigrid_tpu.parallel.reset_budget import resets_for

        resets_per_chunk = resets_for(env, rollout_steps)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        shard_map = jax.shard_map

        from minigrid_tpu.ops.actor_rollout import B as _BLOCK
        from minigrid_tpu.ops.actor_rollout import (
            actor_vmem_estimate,
            fused_actor_rollout,
        )
        from minigrid_tpu.ops.fused_rollout import supports_fused

        num_devices = mesh.devices.size
        assert num_envs % num_devices == 0
        per_shard = num_envs // num_devices
        # ``kernel_interpret`` forces the kernel route in Pallas interpret
        # mode — how the default-lane tests drive this exact shard_map+kernel
        # composition on the virtual CPU mesh (tests/test_shard_map_rollout).
        use_kernel = kernel_interpret or (
            fused_actor
            and jax.devices()[0].platform == "tpu"
            and supports_fused(env)
            and per_shard % _BLOCK == 0
            and env.width * env.height <= 625
            and actor_vmem_estimate(env, resets_per_chunk) <= 100 * 1024 * 1024
        )

        def local(params, states, key):
            k = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
            if use_kernel:
                states, traj = fused_actor_rollout(
                    env, params, states, k, rollout_steps, resets_per_chunk,
                    interpret=kernel_interpret or None,
                )
                return states, Trajectory(**traj)
            states, _, traj = collect_trajectory(
                env, policy_apply, params, states, k,
                rollout_steps, resets_per_chunk, fused_actor=False,
            )
            return states, traj

        sspec = jax.tree.map(lambda _: P(axis_name), env_states)
        tspec = Trajectory(*(P(None, axis_name) for _ in Trajectory._fields))
        run = shard_map(
            local,
            mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(), params), sspec, P()),
            out_specs=(sspec, tspec),
            check_vma=False,
        )
        key, k_use = jax.random.split(key)
        env_states, traj = run(params, env_states, k_use)
        return env_states, key, traj
    if fused_actor:
        from minigrid_tpu.ops.actor_rollout import (
            fused_actor_rollout,
            supports_fused_actor,
        )

        if supports_fused_actor(env, num_envs, resets_per_chunk):
            key, k_roll = jax.random.split(key)
            env_states, traj = fused_actor_rollout(
                env, params, env_states, k_roll, rollout_steps, resets_per_chunk
            )
            return env_states, key, Trajectory(**traj)
    v = env.agent_view_size
    obs_packed = jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))
    if env.expensive_reset:
        from minigrid_tpu.parallel.vector import make_cached_stepper

        key, k_cache = jax.random.split(key)
        cache = env.batch_reset_cache(k_cache, num_envs, resets_per_chunk)
        step_cached = make_cached_stepper(env, cache, num_envs)

    def body(carry, _):
        env_states, used, key = carry
        key, k_act = jax.random.split(key)
        obs = obs_packed(env_states)
        direction = env_states.agent_dir
        logits, value = policy_apply(params, obs, direction)
        action = jax.random.categorical(k_act, logits)
        # One-hot contraction instead of a [N]-row gather (tiny-row gathers
        # are ~5x slower than a fused masked reduce on TPU).
        logp = jnp.sum(
            jnp.where(
                action[:, None] == jnp.arange(logits.shape[-1]),
                jax.nn.log_softmax(logits),
                0.0,
            ),
            axis=-1,
        )
        if env.expensive_reset:
            env_states, reward, terminated, truncated, used = step_cached(
                env_states, action, used
            )
        else:
            _, env_states, reward, terminated, truncated = jax.vmap(env.step)(
                env_states, action
            )
        done = terminated | truncated
        traj = Trajectory(obs, direction, action, logp, value, reward, done)
        return (env_states, used, key), traj

    (env_states, _, key), traj = jax.lax.scan(
        body,
        (env_states, jnp.zeros((num_envs,), jnp.int32), key),
        None,
        length=rollout_steps,
    )
    return env_states, key, traj

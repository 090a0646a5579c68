"""Device-mesh sharding for env batches and learners.

The reference is single-process with no distribution at all (SURVEY.md §2.9:
its only batching is a Python for-loop SyncVectorEnv).  Here scale-out is
single-controller JAX SPMD: the env batch shards over the ``data`` axis of a
``jax.sharding.Mesh``; parameters replicate; XLA partitions the jitted
rollout+update program and inserts ``psum``/``all_gather`` collectives over
ICI.  Multi-host pods use the same code after ``jax.distributed.initialize``
(one process per host, devices global).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = jax.devices() if devices is None else devices
    return Mesh(devices, axis_names=(axis_name,))


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Place a pytree with a leading batch dim so it shards over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(mesh: Mesh, tree):
    """Place a pytree fully replicated on every device of the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def init_distributed(coordinator_address: str | None = None, **kwargs) -> None:
    """Multi-host bring-up: one process per host, global device view
    (the TPU-native analogue of the reference's nonexistent NCCL/MPI layer).
    No-op when JAX is already initialized or single-host."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address, **kwargs)
    except (RuntimeError, ValueError):
        pass  # already initialized or single-process


def sharded_reset(env, mesh: Mesh, key: jax.Array, num_envs: int, axis_name: str = "data"):
    """Reset ``num_envs`` envs with states sharded over the mesh.

    ``num_envs`` must be divisible by the mesh size.
    """
    assert num_envs % mesh.devices.size == 0, (
        f"num_envs={num_envs} not divisible by mesh size {mesh.devices.size}"
    )
    keys = shard_batch(mesh, jax.random.split(key, num_envs), axis_name)
    reset = jax.jit(
        jax.vmap(env.reset),
        out_shardings=(
            NamedSharding(mesh, P(axis_name)),
            NamedSharding(mesh, P(axis_name)),
        ),
    )
    return reset(keys)


@partial(jax.jit, static_argnums=(0, 3, 4))
def _rollout(env, states, key, num_steps, resets_per_chunk):
    from minigrid_tpu.parallel.vector import rollout_random

    return rollout_random(env, states, key, num_steps, resets_per_chunk)


def sharded_rollout(
    env,
    mesh: Mesh,
    states,
    key: jax.Array,
    num_steps: int,
    axis_name: str = "data",
    resets_per_chunk: int | None = None,
):
    """Random-policy rollout over mesh-sharded states.

    The per-env computation is embarrassingly parallel, so XLA partitions the
    scan with zero collectives; the returned reward/episode totals are the
    only cross-device reductions.  Returns (states, total_reward, episodes,
    max_used) — see rollout_random for the reset-budget contract on
    ``max_used``.
    """
    shard = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    run = jax.jit(
        lambda s, k: _rollout(env, s, k, num_steps, resets_per_chunk),
        in_shardings=(jax.tree.map(lambda _: shard, states), repl),
        out_shardings=(jax.tree.map(lambda _: shard, states), repl, repl, repl),
    )
    return run(states, key)


def sharded_rollout_fused(
    env,
    mesh: Mesh,
    states,
    key: jax.Array,
    num_steps: int,
    axis_name: str = "data",
    resets_per_chunk: int | None = None,
    fused: bool | str = "auto",
):
    """Mesh rollout where EACH DEVICE runs the whole-rollout fused Pallas
    kernel on its local env shard.

    ``sharded_rollout`` above relies on XLA's SPMD partitioner, which cannot
    partition a custom call — so on a multi-chip mesh the fused kernel
    (ops/fused_rollout.py) is unreachable through it.  ``shard_map`` is the
    TPU-native answer: the body sees per-shard shapes, so the kernel
    dispatches per device on its local batch, and the reward/episode totals
    are the only collectives (one psum pair over ICI).  Falls back to the
    XLA scan per shard when the kernel is ineligible (non-TPU backend,
    non-default-hook family, shard not a multiple of the kernel block).

    Returns (states, total_reward, episodes, max_used) with totals
    replicated (``max_used``: reset-budget contract, see rollout_random).
    """
    shard_map = jax.shard_map

    from minigrid_tpu.ops.fused_rollout import supports_fused
    from minigrid_tpu.parallel.vector import rollout_random

    num_devices = mesh.devices.size
    num_envs = states.step_count.shape[0]
    assert num_envs % num_devices == 0
    per_shard = num_envs // num_devices
    if fused == "auto":
        wh = env.width * env.height
        fused = (
            jax.devices()[0].platform == "tpu"
            and supports_fused(env)
            and per_shard % 1024 == 0
            and wh <= 361
        )

    def local(states, key):
        k = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        final, total_r, total_done, max_used = rollout_random(
            env, states, k, num_steps, resets_per_chunk, fused
        )
        return (
            final,
            jax.lax.psum(total_r, axis_name),
            jax.lax.psum(total_done, axis_name),
            jax.lax.pmax(max_used, axis_name),
        )

    spec = jax.tree.map(lambda _: P(axis_name), states)
    run = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=(spec, P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(run)(states, key)

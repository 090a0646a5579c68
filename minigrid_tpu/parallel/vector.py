"""Batched lockstep execution.

The reference's only batching is ``gym.vector.SyncVectorEnv`` — a Python
for-loop over env copies (reference: tests/test_envs.py:317-329).  Here the
batch is a leading array dimension: ``vmap`` over env states, ``lax.scan``
over time, auto-reset fused so rollouts never leave the device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def make_cached_stepper(env, cache, num_envs: int):
    """Batched ``step_cached`` with the auto-reset drawn through ONE packed
    gather (utils/tree_gather): the cache is packed to a [N*R, words] int32
    buffer once, and each step gathers row ``n*R + min(used_n, R-1)`` and
    unpacks — semantically identical to ``jax.vmap(env.step_cached)``
    (enforced bit-exactly by tests/test_reset_budget.py) but with an HLO
    whose size is independent of R: the per-step R-way predicated blend
    multiplied the scan body by R x leaves and blew up remote compile time
    at covering R (30-leaf BabyAI states at R=7 never finished).

    Returns ``step(states, actions, used) -> (states, reward, term, trunc,
    used)``.
    """
    import jax.numpy as jnp

    from minigrid_tpu.utils.tree_gather import tree_pack, tree_unpack

    R = jax.tree.leaves(cache)[0].shape[1]
    flat = jax.tree.map(
        lambda a: a.reshape((num_envs * R,) + a.shape[2:]), cache
    )
    packed, meta = tree_pack(flat)
    base = jnp.arange(num_envs, dtype=jnp.int32) * R

    def step(states, actions, used):
        stepped, reward = jax.vmap(env.step_env)(states, actions)
        term, trunc = stepped.terminated, stepped.truncated
        done = term | trunc
        rows = packed[base + jnp.minimum(used, R - 1)]
        fresh = tree_unpack(rows, meta)
        new = jax.tree.map(
            lambda f, b: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (f.ndim - 1)), f, b
            ),
            fresh,
            stepped,
        )
        return new, reward, term, trunc, used + done.astype(jnp.int32)

    return step


def make_pool_stepper(env, pool, num_envs: int):
    """Batched ``step`` with auto-resets drawn from ONE shared pool of fresh
    levels in global episode order.

    ``pool`` is a pytree of ``P`` pre-generated levels (leading axis).  Each
    step ranks this step's finished envs by env index (cumsum) and assigns
    them consecutive pool rows starting at the running ``consumed`` counter,
    so every pool row is consumed at most once and rows are iid fresh levels
    — the same replay-free reset stream as the reference's
    fresh-level-per-reset contract (reference: minigrid/minigrid_env.py:
    119-143), like the per-env-slot cache, but the pool only needs to cover
    the chunk's AGGREGATE episode count (num_envs * mean rate) instead of
    num_envs * per-env-max (reset_budget.pool_size vs resets_for — 40x less
    generation on rare-reset families like BabyAI-GoTo).  On exhaustion the
    gather clamps to the last row (bounded memory) and the returned
    ``consumed`` exceeds ``P`` — callers assert ``consumed <= P``
    (assert_chain_covered) so an undersized pool fails loudly instead of
    publishing replayed levels.

    Returns ``step(states, actions, consumed) -> (states, reward, term,
    trunc, consumed)`` with scalar int32 ``consumed``.
    """
    import jax.numpy as jnp

    from minigrid_tpu.utils.tree_gather import tree_pack, tree_unpack

    packed, meta = tree_pack(pool)
    P = packed.shape[0]

    def step(states, actions, consumed):
        stepped, reward = jax.vmap(env.step_env)(states, actions)
        term, trunc = stepped.terminated, stepped.truncated
        done = term | trunc
        di = done.astype(jnp.int32)
        slot = consumed + jnp.cumsum(di) - 1  # this step's global ranks
        rows = packed[jnp.clip(slot, 0, P - 1)]
        fresh = tree_unpack(rows, meta)
        new = jax.tree.map(
            lambda f, b: jnp.where(
                jnp.reshape(done, done.shape + (1,) * (f.ndim - 1)), f, b
            ),
            fresh,
            stepped,
        )
        return new, reward, term, trunc, consumed + di.sum()

    return step


def batch_reset_pool(env, key: jax.Array, size: int):
    """``size`` fresh iid levels with leading axis ``size`` — the shared
    pool for :func:`make_pool_stepper`, drawn through the family's cache
    generator (pooled rejection sampling for BabyAI, flat vmap otherwise)."""
    cache = env.batch_reset_cache(key, size, 1)
    return jax.tree.map(lambda a: a[:, 0], cache)


class VectorEnv:
    """Lockstep batch of ``num_envs`` copies of one env family."""

    def __init__(self, env, num_envs: int):
        self.env = env
        self.num_envs = int(num_envs)
        self._reset = jax.vmap(env.reset)
        self._step = jax.vmap(env.step)

    def reset(self, key: jax.Array):
        keys = jax.random.split(key, self.num_envs)
        return self._reset(keys)

    def step(self, states, actions):
        return self._step(states, actions)


def fused_eligible(env, num_envs: int, resets_per_chunk: int | None = None) -> bool:
    """Whether the whole-rollout fused kernel (ops/fused_rollout.py) can run
    this configuration: TPU backend, default-hook family, env count divisible
    by the kernel block, and a grid + R-slot reset cache small enough that a
    block fits VMEM (the estimate mirrors fused_rollout_core's
    vmem_limit computation against the v5e's 128 MB physical VMEM)."""
    from minigrid_tpu.ops.fused_rollout import supports_fused
    from minigrid_tpu.parallel.reset_budget import resets_for

    wh = env.width * env.height
    if resets_per_chunk is None:
        resets_per_chunk = resets_for(env, 256)
    ext = getattr(env, "fused_ext", None)
    planes = ext.n_planes if ext is not None else 0
    if ext is not None and getattr(ext, "covers_reset", False):
        resets_per_chunk = 0  # in-kernel generation: no cache resident
    vmem_est = (2 + planes) * (1 + resets_per_chunk) * wh * 1024 * 4 * 3.2
    return (
        jax.devices()[0].platform == "tpu"
        # Single-device only: XLA's SPMD partitioner cannot partition the
        # custom call; sharded multi-chip rollouts use the XLA scan (or wrap
        # the kernel in shard_map on a pod).
        and jax.device_count() == 1
        and supports_fused(env)
        and num_envs % 1024 == 0
        and num_envs >= 1024
        and wh <= 625  # up to MultiRoom-scale 25x25 (VMEM gate below)
        and vmem_est <= 100 * 1024 * 1024
    )


def rollout_capacity(
    env, num_envs: int, num_steps: int, env_id: str | None = None,
    fused: bool | str = "auto",
) -> int:
    """The reset-budget capacity ``rollout_random`` enforces for this config
    — the number ``max_used`` must stay within for the run to be certified
    replay-free (assert_chain_covered): the per-env covering R on the fused
    path, the shared-pool size on the XLA cached path, 0 on the per-step
    regeneration path (exhaustion cannot occur there)."""
    from minigrid_tpu.parallel.reset_budget import pool_size, resets_for

    resets = resets_for(env, num_steps, env_id)
    if fused == "auto":
        fused = fused_eligible(env, num_envs, resets)
    if fused:
        return resets
    if env.expensive_reset:
        return pool_size(env, num_steps, num_envs, env_id)
    return 0


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def rollout_random(
    env,
    states,
    key: jax.Array,
    num_steps: int,
    resets_per_chunk: int | None = None,
    fused: bool | str = "auto",
):
    """Scan ``num_steps`` uniform-random actions over a batch of states.

    Returns (final_states, total_reward, episodes_finished, max_used):
    ``max_used`` counts consumed reset budget — the largest per-env cache
    slot on the fused path, the total shared-pool rows consumed on the XLA
    cached path, 0 on the per-step-regeneration path (exhaustion cannot
    occur).  ``max_used <= rollout_capacity(...)`` certifies the chunk
    matched the reference's fresh-level-per-reset contract; bench.py and
    tools/profiler.py assert exactly this on the runs whose numbers they
    publish.

    For ``env.expensive_reset`` families the per-step regeneration is
    replaced by pre-generated fresh levels: the fused kernel keeps
    ``resets_per_chunk`` levels per env resident in VMEM, while the XLA
    cached path draws from ONE shared pool in global episode order
    (make_pool_stepper) sized to the aggregate episode rate
    (reset_budget.pool_size) — far fewer levels for the same iid contract.
    ``resets_per_chunk=None`` sizes the fused cache from the measured
    episode-rate table (parallel/reset_budget.resets_for).

    ``fused="auto"`` routes eligible configurations (see ``fused_eligible``)
    through the whole-rollout Pallas kernel, which keeps every env's grid in
    VMEM across the full step->reset->obs chain and uses the same per-chunk
    reset cache (R = ``resets_per_chunk``) for ALL families it covers.
    """
    from minigrid_tpu.parallel.reset_budget import resets_for

    num_envs = states.step_count.shape[0]
    if resets_per_chunk is None:
        resets_per_chunk = resets_for(env, num_steps)

    if fused == "auto":
        fused = fused_eligible(env, num_envs, resets_per_chunk)
    if fused:
        from minigrid_tpu.ops.fused_rollout import fused_rollout

        final, total_r, total_done, _, max_used = fused_rollout(
            env, states, key, num_steps, resets_per_chunk, compute_obs=False
        )
        return final, total_r, total_done, max_used

    if env.expensive_reset:
        from minigrid_tpu.parallel.reset_budget import pool_size

        key, k_cache = jax.random.split(key)
        pool = batch_reset_pool(
            env, k_cache, pool_size(env, num_steps, num_envs)
        )
        step_batch = make_pool_stepper(env, pool, num_envs)

        def body(carry, _):
            states, consumed, key, total_r, total_done = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(
                k_act, (num_envs,), 0, env.num_actions, dtype=jnp.int32
            )
            states, reward, term, trunc, consumed = step_batch(
                states, actions, consumed
            )
            total_r = total_r + reward.sum()
            total_done = total_done + (term | trunc).sum()
            return (states, consumed, key, total_r, total_done), None

        init = (
            states,
            jnp.zeros((), jnp.int32),
            key,
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.int32),
        )
        (states, consumed, _, total_r, total_done), _ = jax.lax.scan(
            body, init, None, length=num_steps
        )
        return states, total_r, total_done, consumed

    step_batch = jax.vmap(env.step)

    def body(carry, _):
        states, key, total_r, total_done = carry
        key, k_act = jax.random.split(key)
        actions = jax.random.randint(
            k_act, (num_envs,), 0, env.num_actions, dtype=jnp.int32
        )
        _, states, reward, terminated, truncated = step_batch(states, actions)
        total_r = total_r + reward.sum()
        total_done = total_done + (terminated | truncated).sum()
        return (states, key, total_r, total_done), None

    init = (states, key, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))
    (states, _, total_r, total_done), _ = jax.lax.scan(
        body, init, None, length=num_steps
    )
    return states, total_r, total_done, jnp.zeros((), jnp.int32)

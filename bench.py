"""Throughput benchmark: batched random-policy env-steps/s on Empty-8x8.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: 50M env-steps/s per host on Empty-8x8 (BASELINE.md north star; the
reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import minigrid_tpu as mg
from minigrid_tpu.parallel.vector import rollout_random

NUM_ENVS = 65536
NUM_STEPS = 256
WARMUP_ITERS = 2
MEASURE_ITERS = 5
BASELINE_STEPS_PER_SEC = 50e6


def main():
    env = mg.make("MiniGrid-Empty-8x8-v0")
    key = jax.random.PRNGKey(0)
    k_reset, k_roll = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k_reset, NUM_ENVS))

    # Warmup / compile.
    for i in range(WARMUP_ITERS):
        states, total_r, total_done = rollout_random(env, states, jax.random.fold_in(k_roll, i), NUM_STEPS)
    jax.block_until_ready(states)

    t0 = time.perf_counter()
    for i in range(MEASURE_ITERS):
        states, total_r, total_done = rollout_random(
            env, states, jax.random.fold_in(k_roll, 100 + i), NUM_STEPS
        )
    jax.block_until_ready(states)
    dt = time.perf_counter() - t0

    steps = NUM_ENVS * NUM_STEPS * MEASURE_ITERS
    sps = steps / dt

    # Secondary: observation-consuming rollout (the PPO-training-shaped
    # metric; obs generation cannot be dead-code-eliminated here).
    obs_batch = jax.vmap(env.observation)

    @jax.jit
    def rollout_with_obs(states, key):
        def body(carry, _):
            states, key, acc = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(
                k_act, (NUM_ENVS,), 0, env.num_actions, dtype=jnp.int32
            )
            _, states, reward, term, trunc = jax.vmap(env.step)(states, actions)
            o = obs_batch(states)
            acc = acc + o["image"][:, 0, 0, 0].astype(jnp.int32).sum()
            return (states, key, acc), None

        (states, _, acc), _ = jax.lax.scan(
            body, (states, key, jnp.int32(0)), None, length=NUM_STEPS
        )
        return states, acc

    states2, acc = rollout_with_obs(states, k_roll)
    jax.block_until_ready(acc)
    t0 = time.perf_counter()
    states2, acc = rollout_with_obs(states, jax.random.fold_in(k_roll, 999))
    jax.block_until_ready(acc)
    obs_sps = NUM_ENVS * NUM_STEPS / (time.perf_counter() - t0)

    # Secondary tracked config: DoorKey-8x8 (BASELINE.md), amortized resets.
    dk = mg.make("MiniGrid-DoorKey-8x8-v0")
    _, dk_states = jax.jit(jax.vmap(dk.reset))(jax.random.split(k_reset, NUM_ENVS))
    out = rollout_random(dk, dk_states, k_roll, NUM_STEPS)
    jax.block_until_ready(out)
    dk_best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = rollout_random(dk, dk_states, jax.random.fold_in(k_roll, 200 + i), NUM_STEPS)
        jax.block_until_ready(out)
        dk_best = min(dk_best, time.perf_counter() - t0)
    dk_sps = NUM_ENVS * NUM_STEPS / dk_best

    # Third tracked config: BabyAI-GoToLocal (language missions, pooled
    # reset-cache generation), 16384 envs.
    bl = mg.make("BabyAI-GoToLocal-v0")
    n_bl = 16384
    _, bl_states = jax.jit(jax.vmap(bl.reset))(jax.random.split(k_reset, n_bl))
    out = rollout_random(bl, bl_states, k_roll, NUM_STEPS)
    jax.block_until_ready(out)
    bl_best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = rollout_random(bl, bl_states, jax.random.fold_in(k_roll, 300 + i), NUM_STEPS)
        jax.block_until_ready(out)
        bl_best = min(bl_best, time.perf_counter() - t0)
    bl_sps = n_bl * NUM_STEPS / bl_best

    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_empty8x8_random_policy",
                "value": round(sps),
                "unit": "steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 4),
                "obs_consumed_steps_per_sec": round(obs_sps),
                "doorkey8x8_steps_per_sec": round(dk_sps),
                "babyai_gotolocal_steps_per_sec": round(bl_sps),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Split BabyAI rollout cost: cache generation vs stepping (interleaved min)."""

import time

import jax
import jax.numpy as jnp

import minigrid_tpu as mg
from minigrid_tpu.parallel.vector import rollout_random

key = jax.random.PRNGKey(0)

CONFIGS = [
    ("BabyAI-GoToLocal-v0", 16384, 128),
    ("BabyAI-GoTo-v0", 8192, 128),
]

for env_id, n, T in CONFIGS:
    env = mg.make(env_id)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))

    gen = jax.jit(lambda k: env.batch_reset_cache(k, n, 2))
    cache = gen(key)
    jax.block_until_ready(cache)

    # stepping only, reusing a fixed cache
    @jax.jit
    def steps_only(states, cache, key):
        step_batch = jax.vmap(env.step_cached)

        def body(carry, _):
            states, used, key = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(k_act, (n,), 0, 7, dtype=jnp.int32)
            _, states, r, te, tr, used = step_batch(states, actions, cache, used)
            return (states, used, key), None

        (states, _, _), _ = jax.lax.scan(
            body, (states, jnp.zeros((n,), jnp.int32), key), None, length=T
        )
        return states

    out = steps_only(states, cache, key)
    jax.block_until_ready(out)
    full = rollout_random(env, states, key, T)
    jax.block_until_ready(full)

    t_gen = t_step = t_full = float("inf")
    for i in range(4):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        c = gen(k)
        jax.block_until_ready(c)
        t_gen = min(t_gen, time.perf_counter() - t0)
        t0 = time.perf_counter()
        o = steps_only(states, cache, k)
        jax.block_until_ready(o)
        t_step = min(t_step, time.perf_counter() - t0)
        t0 = time.perf_counter()
        f = rollout_random(env, states, k, T)
        jax.block_until_ready(f)
        t_full = min(t_full, time.perf_counter() - t0)

    print(
        f"{env_id:24s} n={n:6d} T={T}: gen {t_gen*1e3:7.1f} ms  "
        f"steps {t_step*1e3:7.1f} ms  full {t_full*1e3:7.1f} ms  "
        f"-> full {n*T/t_full/1e6:7.1f} M steps/s, steps-only {n*T/t_step/1e6:7.1f} M steps/s",
        flush=True,
    )

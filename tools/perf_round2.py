"""Consolidated round-2 TPU measurement: obs path, BabyAI generation, PPO.

One process so the tunnel init/compile cost is paid once.  Interleaved
min-of-reps per metric (tools/perf_interleave.py pattern).
"""

import time

import jax
import jax.numpy as jnp

import minigrid_tpu as mg
from minigrid_tpu.parallel.vector import rollout_random


def timed(fn, *args, reps=4):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    key = jax.random.PRNGKey(0)

    # -- 1. Empty-8x8: raw step vs obs-consumed ------------------------------
    N, T = 65536, 256
    env = mg.make("MiniGrid-Empty-8x8-v0")
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))

    def raw(k):
        return rollout_random(env, states, k, T)

    obs_batch = jax.vmap(env.observation)

    @jax.jit
    def with_obs(k):
        def body(carry, _):
            st, kk, acc = carry
            kk, ka = jax.random.split(kk)
            a = jax.random.randint(ka, (N,), 0, env.num_actions, dtype=jnp.int32)
            _, st, r, te, tr = jax.vmap(env.step)(st, a)
            o = obs_batch(st)
            acc = acc + o["image"].astype(jnp.int32).sum()
            return (st, kk, acc), None

        (st, _, acc), _ = jax.lax.scan(body, (states, k, jnp.int32(0)), None, length=T)
        return st, acc

    t_raw = timed(raw, jax.random.fold_in(key, 1))
    t_obs = timed(with_obs, jax.random.fold_in(key, 2))
    print(f"empty8x8 raw     {N*T/t_raw/1e6:8.1f} M steps/s", flush=True)
    print(f"empty8x8 obs     {N*T/t_obs/1e6:8.1f} M steps/s", flush=True)

    # -- 2. DoorKey obs-consumed (22x22-free; 8x8 grid, occlusion on) --------
    env2 = mg.make("MiniGrid-DoorKey-8x8-v0")
    _, st2 = jax.jit(jax.vmap(env2.reset))(jax.random.split(key, N))

    def dk(k):
        return rollout_random(env2, st2, k, T)

    t_dk = timed(dk, jax.random.fold_in(key, 3))
    print(f"doorkey8x8 roll  {N*T/t_dk/1e6:8.1f} M steps/s", flush=True)

    # -- 3. BabyAI: cache gen vs stepping ------------------------------------
    for env_id, n, T2 in [("BabyAI-GoToLocal-v0", 16384, 128), ("BabyAI-GoTo-v0", 8192, 128)]:
        env3 = mg.make(env_id)
        _, st3 = jax.jit(jax.vmap(env3.reset))(jax.random.split(key, n))
        gen = jax.jit(lambda k, e=env3, m=n: e.batch_reset_cache(k, m, 2))

        def full(k, e=env3, s=st3, t=T2):
            return rollout_random(e, s, k, t)

        t_gen = timed(gen, jax.random.fold_in(key, 4))
        t_full = timed(full, jax.random.fold_in(key, 5))
        print(
            f"{env_id:22s} gen {t_gen*1e3:7.1f} ms  full {n*T2/t_full/1e6:7.1f} M steps/s",
            flush=True,
        )

    # -- 3b. WFC level generation time ---------------------------------------
    from minigrid_tpu.envs.wfc.solver import wfc_solve
    from minigrid_tpu.envs.wfc.preprocess import preset_tables

    t = preset_tables("MazeSimple")
    wfc = jax.jit(
        lambda k: wfc_solve(
            k,
            jnp.asarray(t["adj"]),
            jnp.asarray(t["weights"]),
            jnp.zeros((23, 23)),
            periodic=False,
            max_attempts=64,
        )
    )
    t_wfc = timed(wfc, jax.random.fold_in(key, 6))
    print(f"wfc MazeSimple   {t_wfc*1e3:8.1f} ms/level", flush=True)

    # -- 4. PPO end-to-end ----------------------------------------------------
    from minigrid_tpu.rl.ppo import PPOConfig, make_ppo

    envp = mg.make("MiniGrid-Empty-8x8-v0")
    cfg = PPOConfig(rollout_steps=128)
    init_fn, train_step = make_ppo(envp, cfg, hidden=256)
    ts = init_fn(jax.random.PRNGKey(7), 8192)
    step = jax.jit(train_step)
    ts, m = step(ts)
    jax.block_until_ready(m["pg_loss"])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        ts, m = step(ts)
        jax.block_until_ready(m["pg_loss"])
        best = min(best, time.perf_counter() - t0)
    print(f"ppo 8192x128     {8192*128/best/1e6:8.2f} M env-steps/s", flush=True)


if __name__ == "__main__":
    main()

import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg
from minigrid_tpu.parallel.vector import rollout_random

key = jax.random.PRNGKey(0)
for env_id, n in [("BabyAI-GoToLocal-v0", 16384), ("MiniGrid-KeyCorridorS3R1-v0", 32768)]:
    env = mg.make(env_id)
    T = 128
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))
    for i in range(3):
        out, r, d = rollout_random(env, states, jax.random.fold_in(key, i), T)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out, r, d = rollout_random(env, states, jax.random.fold_in(key, 10+i), T)
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"{env_id:38s} {n*T/dt/1e6:8.1f} M steps/s  (episodes/chunk {int(d)})", flush=True)

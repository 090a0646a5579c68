import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg
from functools import partial

key = jax.random.PRNGKey(0)
env = mg.make("MiniGrid-KeyCorridorS3R1-v0")
n, T = 4096, 64
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))
jax.block_until_ready(states.grid)

gen_cache = jax.jit(jax.vmap(env.reset_cache, in_axes=(0, None)), static_argnums=1)
cache = gen_cache(jax.random.split(key, n), 2)
jax.block_until_ready(cache.grid)
t0 = time.perf_counter()
for i in range(3):
    cache = gen_cache(jax.random.split(jax.random.fold_in(key, i), n), 2)
jax.block_until_ready(cache.grid)
print(f"cache gen (n={n}, R=2): {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

@jax.jit
def run_cached(states, cache, key):
    used = jnp.zeros((n,), jnp.int32)
    def f(carry, _):
        s, used, k = carry
        k, ka = jax.random.split(k)
        a = jax.random.randint(ka, (n,), 0, 7, dtype=jnp.int32)
        _, s, r, te, tr, used = jax.vmap(env.step_cached)(s, a, cache, used)
        return (s, used, k), None
    (s, _, _), _ = jax.lax.scan(f, (states, used, key), None, length=T)
    return s

out = run_cached(states, cache, key); jax.block_until_ready(out.grid)
t0 = time.perf_counter()
for i in range(3): out = run_cached(states, cache, jax.random.fold_in(key, i))
jax.block_until_ready(out.grid)
dt = (time.perf_counter()-t0)/3
print(f"cached scan: {n*T/dt/1e6:.2f} M steps/s ({dt/T*1e6:.1f} us/iter)", flush=True)

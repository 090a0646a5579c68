import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg

key = jax.random.PRNGKey(0)
env = mg.make("MiniGrid-KeyCorridorS3R1-v0")
n, T = 4096, 64
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))

@jax.jit
def run_plain(states, key):
    def f(carry, _):
        s, k = carry
        k, ka = jax.random.split(k)
        a = jax.random.randint(ka, (n,), 0, 7, dtype=jnp.int32)
        _, s, r, te, tr = jax.vmap(env.step)(s, a)
        return (s, k), None
    (s, _), _ = jax.lax.scan(f, (states, key), None, length=T)
    return s

for i in range(3): out = run_plain(states, jax.random.fold_in(key, i))
jax.block_until_ready(out)
t0 = time.perf_counter()
for i in range(3): out = run_plain(states, jax.random.fold_in(key, 10+i))
jax.block_until_ready(out)
dt = (time.perf_counter()-t0)/3
print(f"plain fused autoreset: {n*T/dt/1e6:8.2f} M steps/s")

# time a single batched cache generation
t0 = time.perf_counter()
cache = jax.jit(jax.vmap(env.reset_cache, in_axes=(0, None)), static_argnums=1)(jax.random.split(key, n), 2)
jax.block_until_ready(cache.grid)
print("cache gen compile+run:", time.perf_counter()-t0)
t0 = time.perf_counter()
cache = jax.jit(jax.vmap(env.reset_cache, in_axes=(0, None)), static_argnums=1)(jax.random.split(jax.random.fold_in(key,1), n), 2)
jax.block_until_ready(cache.grid)
print("cache gen steady:", time.perf_counter()-t0)

import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg
from minigrid_tpu.core.step import core_step

env = mg.make("MiniGrid-Empty-8x8-v0")
N, T = 16384, 256
key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))

def bench(name, body):
    @jax.jit
    def run(states, key):
        def f(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (N,), 0, 7, dtype=jnp.int32)
            s = body(s, a)
            return (s, k), None
        (s, _), _ = jax.lax.scan(f, (states, key), None, length=T)
        return s
    out = run(states, key); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = run(states, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name:34s} {N*T/dt/1e6:8.1f} M steps/s ({dt/T*1e6:7.1f} us/iter)")

# full step_env (with rng split)
bench("step_env (split+pre+core)", jax.vmap(lambda s, a: env.step_env(s, a)[0]))
# core_step only, no rng split
bench("core_step only", jax.vmap(lambda s, a: core_step(s, a)[0]))
# rng split only
def split_only(s, a):
    k, _ = jax.random.split(s.rng)
    return s.replace(rng=k)
bench("rng split only", jax.vmap(split_only))
# core_step without the grid write (stop after gather+scalars)
def no_write(s, a):
    st, _ = core_step(s, a)
    return st.replace(grid=s.grid, contains=s.contains)
bench("core_step, grid write discarded", jax.vmap(no_write))
# actions only (baseline scan overhead)
bench("noop (carry only)", jax.vmap(lambda s, a: s.replace(step_count=s.step_count + a)))

import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg
from minigrid_tpu.core.step import core_step

env = mg.make("MiniGrid-Empty-8x8-v0")
N, T = 16384, 256
key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))

def make_run(body):
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
    return run

def bench(name, body):
    run = make_run(body)
    for i in range(4):  # generous warmup
        out = run(states, jax.random.fold_in(key, 50+i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(5):
        out = run(states, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"{name:36s} {N*T/dt/1e6:8.1f} M steps/s ({dt/T*1e6:7.1f} us/iter)")

# global device warmup
warm = make_run(jax.vmap(lambda s, a: s.replace(step_count=s.step_count+a)))
for i in range(6): out = warm(states, jax.random.fold_in(key, i))
jax.block_until_ready(out)

bench("noop floor", jax.vmap(lambda s, a: s.replace(step_count=s.step_count+a)))
bench("core_step", jax.vmap(lambda s, a: core_step(s, a)[0]))
bench("step_env", jax.vmap(lambda s, a: env.step_env(s, a)[0]))
bench("step_env+autoreset", jax.vmap(lambda s, a: env.autoreset(env.step_env(s, a)[0])))
obs = jax.vmap(lambda s: env.observation(s))
def with_obs(s, a):
    s = jax.vmap(lambda s_, a_: env.autoreset(env.step_env(s_, a_)[0]))(s, a)
    o = obs(s)
    return s.replace(step_count=s.step_count + o["image"][:, 0, 0, 0].astype(jnp.int32))
bench("step+reset+obs(used)", with_obs)

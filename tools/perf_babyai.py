import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg

N, T = 4096, 64
key = jax.random.PRNGKey(0)
env = mg.make("BabyAI-GoToRedBallGrey-v0")
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
    for i in range(3): out = run(states, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3): out = run(states, jax.random.fold_in(key, 10+i))
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"{name:30s} {N*T/dt/1e6:8.2f} M steps/s ({dt/T*1e6:8.1f} us/iter)", flush=True)

bench("step_env only (incl verify)", jax.vmap(lambda s, a: env.step_env(s, a)[0]))
bench("autoreset only", jax.vmap(lambda s, a: env.autoreset(s)))
bench("full step", jax.vmap(lambda s, a: env.step(s, a)[1]))
from minigrid_tpu.core.step import core_step
bench("core_step only", jax.vmap(lambda s, a: core_step(s, a)[0]))

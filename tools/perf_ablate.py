import time, functools
import jax, jax.numpy as jnp
import minigrid_tpu as mg

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
    print(f"{name:30s} {N*T/dt/1e6:8.1f} M steps/s   ({dt/T*1e6:6.1f} us/iter)")

step_env = jax.vmap(env.step_env)
autoreset = jax.vmap(env.autoreset)
full = jax.vmap(lambda s, a: env.step(s, a)[1])
obs = jax.vmap(lambda s: env.observation(s))

bench("full step (step+reset+obs dce)", full)
bench("step_env only", lambda s, a: step_env(s, a)[0])
bench("autoreset only", lambda s, a: autoreset(s))
bench("step_env+autoreset", lambda s, a: autoreset(step_env(s, a)[0]))
def with_obs(s, a):
    s = autoreset(step_env(s, a)[0])
    o = obs(s)
    return s.replace(step_count=s.step_count + o["image"][:, 0, 0, 0].astype(jnp.int32))
bench("step+reset+obs (used)", with_obs)

import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg

N, T = 16384, 128
key = jax.random.PRNGKey(0)

def bench(env_id, n=N):
    env = mg.make(env_id)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))
    @jax.jit
    def run(states, key):
        def f(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (n,), 0, 7, dtype=jnp.int32)
            _, s, r, te, tr = jax.vmap(env.step)(s, a)
            return (s, k), None
        (s, _), _ = jax.lax.scan(f, (states, key), None, length=T)
        return s
    for i in range(3):
        out = run(states, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(3):
        out = run(states, jax.random.fold_in(key, 10+i))
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/3
    print(f"{env_id:40s} {n*T/dt/1e6:8.1f} M steps/s", flush=True)

bench("MiniGrid-Empty-8x8-v0")
bench("MiniGrid-DoorKey-8x8-v0")
bench("MiniGrid-LavaCrossingS9N1-v0")
bench("MiniGrid-Dynamic-Obstacles-8x8-v0")
bench("BabyAI-GoToRedBallGrey-v0", n=4096)
bench("BabyAI-GoToLocal-v0", n=4096)

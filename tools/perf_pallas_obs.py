import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.ops.obs_pallas import fused_obs_packed
from minigrid_tpu.core.constants import unpack_grid

N, T = 16384, 128
env = mg.make("MiniGrid-Empty-8x8-v0")
key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))

def bench(name, obs_fn):
    @jax.jit
    def run(states, key):
        def f(carry, _):
            s, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.randint(ka, (N,), 0, 7, dtype=jnp.int32)
            s = jax.vmap(lambda s_, a_: env.autoreset(env.step_env(s_, a_)[0]))(s, a)
            img = obs_fn(s)
            s = s.replace(step_count=s.step_count + img[:, 0, 0].astype(jnp.int32))
            return (s, k), None
        (s, _), _ = jax.lax.scan(f, (states, key), None, length=T)
        return s
    for i in range(4): out = run(states, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(5): out = run(states, jax.random.fold_in(key, 10+i))
    jax.block_until_ready(out)
    dt = (time.perf_counter()-t0)/5
    print(f"{name:34s} {N*T/dt/1e6:8.1f} M steps/s ({dt/T*1e6:7.1f} us/iter)", flush=True)

bench("XLA obs (uint8 image consumed)",
      lambda s: jax.vmap(lambda s_: gen_obs_image(s_, 7, False))(s)[:, :, :, 0])
bench("pallas obs (packed consumed)",
      lambda s: fused_obs_packed(s.grid, s.agent_x, s.agent_y, s.agent_dir, s.carrying, 7, False)[:, :, :] & 0xFF)
for B in (2048, 8192, 16384):
    bench(f"pallas obs block={B}",
          lambda s, B=B: fused_obs_packed(s.grid, s.agent_x, s.agent_y, s.agent_dir, s.carrying, 7, False, block=B)[:, :, :] & 0xFF)

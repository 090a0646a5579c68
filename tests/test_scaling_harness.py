"""Scaling-harness validation (minigrid_tpu/parallel/scaling.py) — the
round-2 verdict found the wall-clock t(1)/t(N) quotient self-refuting, so
the harness is now STRUCTURAL: the partitioned HLO must contain exactly the
collectives the design predicts, and a sabotaged program must be flagged.

Negative controls:
  * a rollout with an injected per-step grid ``all_gather`` must show a
    grid-batch-sized all-gather in its HLO (clean shows none), and
  * with the process pinned to one core, the sabotaged program must also be
    measurably slower than the clean one at the same mesh size (relative
    timing only — no cross-mesh-size baseline, which CPU codegen artifacts
    pollute).
"""

from __future__ import annotations

import os
import time

import jax
import pytest

import minigrid_tpu as mg
from minigrid_tpu.parallel.scaling import (
    hlo_collectives,
    modeled_ppo_efficiency,
    param_bytes,
    pin_to_one_core,
    ppo_runner,
    restore_affinity,
    rollout_runner,
)

MESH8 = lambda: jax.sharding.Mesh(jax.devices()[:8], axis_names=("data",))


def test_clean_rollout_has_no_data_collectives():
    env = mg.make("MiniGrid-Empty-8x8-v0")
    fn, args = rollout_runner(env, 512, 8)(MESH8())
    colls = hlo_collectives(fn, *args)
    # Only the scalar reward/done reductions may cross devices.
    assert all(b <= 64 for _, b in colls), colls


def test_sabotaged_rollout_is_flagged_structurally():
    env = mg.make("MiniGrid-Empty-8x8-v0")
    fn, args = rollout_runner(env, 512, 8, sabotage=True)(MESH8())
    colls = hlo_collectives(fn, *args)
    gathers = [b for op, b in colls if op == "all-gather"]
    # 512 envs x 64 cells x 4 bytes: the full grid batch moves every step.
    assert gathers and max(gathers) >= 512 * 64 * 4, colls


def test_ppo_partitioning_is_gradient_allreduce_only():
    env = mg.make("MiniGrid-Empty-5x5-v0")
    mesh = MESH8()
    fn, args = ppo_runner(env, 512)(mesh)
    colls = hlo_collectives(fn, *args)
    pb = param_bytes(args[0].params)
    big = [(op, b) for op, b in colls if b > 64]
    # Exactly the gradient all-reduce crosses devices (within fusion slack)...
    assert big and all(op == "all-reduce" for op, _ in big), colls
    assert max(b for _, b in big) <= 2 * pb, (colls, pb)
    # ...and nothing trajectory-sized leaks (the env-axis-slicing failure
    # mode all-gathers the rollout: >= T x N_local x obs bytes >> params).
    traj_bytes = 16 * (512 // 8) * 25 * 4
    assert all(b < max(2 * pb, traj_bytes) for _, b in colls), colls


def test_sabotage_also_slower_wallclock_single_core():
    env = mg.make("MiniGrid-Empty-8x8-v0")
    prev = pin_to_one_core()
    try:
        def best_time(sabotage):
            fn, args = rollout_runner(env, 1024, 32, sabotage)(MESH8())
            jax.block_until_ready(fn(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(fn(*args))
                best = min(best, time.perf_counter() - t0)
            return best

        t_clean = best_time(False)
        t_sab = best_time(True)
    finally:
        restore_affinity(prev)
    assert t_sab > 1.15 * t_clean, (t_clean, t_sab)


def test_modeled_efficiency_formula():
    env = mg.make("MiniGrid-Empty-5x5-v0")
    from minigrid_tpu.rl.ppo import PPOConfig, make_ppo

    init_fn, _ = make_ppo(env, PPOConfig(rollout_steps=16, num_minibatches=2), hidden=64)
    st = init_fn(jax.random.PRNGKey(0), 8)
    # Compute-dominated step -> near-1 efficiency; absurdly slow ICI -> low.
    hi = modeled_ppo_efficiency(0.1, st.params, 8, 1, 8)
    lo = modeled_ppo_efficiency(0.1, st.params, 8, 1, 8, ici_bytes_per_sec=1e5)
    assert hi > 0.95 and lo < 0.8, (hi, lo)

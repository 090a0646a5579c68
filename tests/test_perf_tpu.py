"""Opt-in TPU perf-regression lane with TREND-BASED floors.

Round-2's fixed floors sat 2.5x below the measured numbers, so a -7.7%
regression (DoorKey, round 2) sailed through.  Floors now derive from the
last measured numbers on the real chip (tools/perf_trend.json, refreshed
with ``python tools/profiler.py trend`` after perf work): each metric must
stay above ``TREND_RATIO`` of its last recorded value.  The ratio is 0.6 —
tight enough to catch any real regression bigger than the axon tunnel's
run-to-run drift (best-of-N rejects most of it; tools/perf_interleave.py
measured up to 2x single-run drift), and 4x tighter than the old pads.

Run with ``RUN_TPU_PERF=1 python -m pytest tests/test_perf_tpu.py`` on a
machine with a real TPU attached.
"""

from __future__ import annotations

import json
import os
import time

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_PERF"),
    reason="TPU perf lane: set RUN_TPU_PERF=1 on a TPU machine",
)

N, T = 65536, 256
TREND_RATIO = 0.6
TREND_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "perf_trend.json",
)


def _trend():
    with open(TREND_PATH) as f:
        return json.load(f)


def _require_tpu():
    import jax

    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")


def _best_of(fn, reps=5):
    import jax

    jax.block_until_ready(fn())  # compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def _rollout_sps(env_id, seed=0):
    import jax

    import minigrid_tpu as mg
    from minigrid_tpu.parallel.vector import rollout_random

    env = mg.make(env_id)
    key = jax.random.PRNGKey(seed)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, N))
    return N * T / _best_of(lambda: rollout_random(env, states, key, T))


def _assert_trend(key, sps):
    floor = TREND_RATIO * _trend()[key]
    assert sps > floor, (
        f"{key} regressed: {sps/1e6:.0f}M < {floor/1e6:.0f}M "
        f"(= {TREND_RATIO} x last measured {_trend()[key]/1e6:.0f}M; "
        f"refresh tools/perf_trend.json via profiler.py trend if this is an "
        f"accepted change)"
    )


def test_empty8x8_rollout_trend():
    _require_tpu()
    _assert_trend("empty8x8_rollout_sps", _rollout_sps("MiniGrid-Empty-8x8-v0"))


def test_doorkey_rollout_trend():
    _require_tpu()
    _assert_trend("doorkey8x8_rollout_sps", _rollout_sps("MiniGrid-DoorKey-8x8-v0", seed=1))


def test_fourrooms_rollout_trend():
    _require_tpu()
    _assert_trend("fourrooms_rollout_sps", _rollout_sps("MiniGrid-FourRooms-v0", seed=2))


def test_obs_consumed_trend():
    _require_tpu()
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(TREND_PATH)))
    from profiler import obs_sps

    _assert_trend("obs_consumed_sps", obs_sps("MiniGrid-Empty-8x8-v0", N, T))


def test_ppo_marginal_trend():
    _require_tpu()
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(TREND_PATH)))
    from profiler import ppo_times

    _, marg = ppo_times()
    _assert_trend("ppo_sps_marginal", 8192 * 128 / marg)

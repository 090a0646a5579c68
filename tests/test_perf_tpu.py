"""Opt-in TPU perf-regression lane with TREND-BASED floors over EVERY
tracked metric.

Round-2's fixed floors sat 2.5x below the measured numbers, so a -7.7%
regression (DoorKey, round 2) sailed through; round 3's floors covered only
5 of ~13 metrics, so LavaCrossing slipped -2.7% unwatched.  Floors now
derive from the last measured numbers on the real chip
(tools/perf_trend.json, refreshed with ``python tools/profiler.py trend``
after perf work) and the test list is GENERATED from the same metric
registry the refresh uses (tools/profiler.TREND_METRICS) — a metric cannot
be tracked without being floored.  Each metric must stay above
``TREND_RATIO`` of its last recorded value; 0.6 is tight enough to catch
any real regression bigger than the axon tunnel's run-to-run drift
(best-of-N rejects most of it; tools/perf_interleave.py measured up to 2x
single-run drift).

Run with ``RUN_TPU_PERF=1 python -m pytest tests/test_perf_tpu.py`` on a
machine with a real TPU attached.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_TPU_PERF"),
    reason="TPU perf lane: set RUN_TPU_PERF=1 on a TPU machine",
)

TREND_RATIO = 0.6
TOOLS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
)
TREND_PATH = os.path.join(TOOLS_DIR, "perf_trend.json")

sys.path.insert(0, TOOLS_DIR)
from profiler import TREND_METRICS, ppo_times  # noqa: E402


def _trend():
    with open(TREND_PATH) as f:
        return json.load(f)


def _require_tpu():
    import jax

    if jax.devices()[0].platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")


def _assert_trend(key, value):
    trend = _trend()
    assert key in trend, (
        f"{key} has no recorded trend value — run `python tools/profiler.py "
        f"trend` on the TPU box to establish the floor"
    )
    floor = TREND_RATIO * trend[key]
    assert value > floor, (
        f"{key} regressed: {value/1e6:.1f}M < {floor/1e6:.1f}M "
        f"(= {TREND_RATIO} x last measured {trend[key]/1e6:.1f}M; "
        f"refresh tools/perf_trend.json via profiler.py trend if this is an "
        f"accepted change)"
    )


@pytest.mark.parametrize("metric", sorted(TREND_METRICS))
def test_metric_trend(metric):
    _require_tpu()
    _assert_trend(metric, TREND_METRICS[metric]())


def test_ppo_trend():
    """Single-dispatch and marginal PPO rates share one measurement (the
    marginal differencing reuses the compiled program)."""
    _require_tpu()
    t1, marg, pipe = ppo_times()
    _assert_trend("ppo_sps_single_dispatch", 8192 * 128 / t1)
    _assert_trend("ppo_sps_marginal", 8192 * 128 / marg)
    _assert_trend("ppo_sps_pipelined", 8192 * 128 / pipe)


def test_trend_file_covers_registry():
    """Every registry metric has a floor on file, so a metric added without
    refreshing the trend file fails the lane immediately."""
    trend = _trend()
    missing = [k for k in TREND_METRICS if k not in trend]
    assert not missing, (
        f"metrics without floors: {missing}; run profiler.py trend on the "
        f"TPU box and commit tools/perf_trend.json"
    )


def test_kernel_under_shard_map_real_chip():
    """The compiled (non-interpret) kernel inside ``shard_map`` on a
    1-device TPU mesh, bit-exact vs the direct kernel call — the on-chip
    half of the kernel-under-shard_map coverage (the interpret-mode
    multi-shard half runs in the default lane,
    tests/test_shard_map_rollout.py)."""
    _require_tpu()
    import numpy as np

    import jax
    from jax.sharding import Mesh

    import minigrid_tpu as mg
    from minigrid_tpu.ops.actor_rollout import fused_actor_rollout
    from minigrid_tpu.rl.model import ActorCritic
    from minigrid_tpu.rl.rollout import collect_trajectory

    env = mg.make("BabyAI-GoToLocal-v0")
    mesh = Mesh(jax.devices()[:1], axis_names=("data",))
    n, t, resets = 1024, 8, 2
    v = env.agent_view_size
    model = ActorCritic(hidden=32, num_actions=env.num_actions)
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, n))
    obs0 = jax.vmap(lambda s: env.observation_packed(s).reshape(v * v))(states)
    params = model.init(k2, obs0[:1], states.agent_dir[:1], packed=True)

    def policy_apply(p, obs, direction):
        return model.apply(p, obs, direction, packed=True)

    final, _, traj = collect_trajectory(
        env, policy_apply, params, states, k3, t, resets,
        fused_actor=True, mesh=mesh,
    )
    _, k_use = jax.random.split(k3)
    fin_d, traj_d = fused_actor_rollout(
        env, params, states, jax.random.fold_in(k_use, 0), t, resets
    )
    np.testing.assert_array_equal(np.asarray(final.grid), np.asarray(fin_d.grid))
    for f in ["obs", "action", "logp", "value", "reward", "done"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(traj, f)), np.asarray(traj_d[f]), err_msg=f
        )

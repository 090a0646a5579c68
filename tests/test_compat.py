"""Gymnasium-compat conformance (reference: tests/test_envs.py:30-103 runs
gymnasium's check_env + seeded-determinism over every spec; here over a
representative sample because each env family is a fresh XLA compile on the
CPU test backend)."""

from __future__ import annotations

import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from minigrid_tpu.compat import gym_make

SAMPLE_IDS = [
    "MiniGrid-Empty-5x5-v0",
    "MiniGrid-DoorKey-5x5-v0",
    "MiniGrid-Dynamic-Obstacles-5x5-v0",
    "BabyAI-GoToRedBallGrey-v0",
]


@pytest.mark.parametrize("env_id", SAMPLE_IDS)
def test_check_env(env_id):
    from gymnasium.utils.env_checker import check_env

    env = gym_make(env_id, render_mode="rgb_array")
    check_env(env, skip_render_check=False)


@pytest.mark.parametrize("env_id", SAMPLE_IDS)
def test_seeded_determinism_via_shim(env_id):
    """Same seed => identical 30-step rollouts (reference test_envs.py:51-103)."""
    a, b = gym_make(env_id), gym_make(env_id)
    obs_a, _ = a.reset(seed=123)
    obs_b, _ = b.reset(seed=123)
    np.testing.assert_array_equal(obs_a["image"], obs_b["image"])
    assert obs_a["mission"] == obs_b["mission"]
    rng = np.random.default_rng(0)
    for _ in range(30):
        act = int(rng.integers(0, a.action_space.n))
        oa, ra, ta, tra, _ = a.step(act)
        ob, rb, tb, trb, _ = b.step(act)
        np.testing.assert_array_equal(oa["image"], ob["image"])
        assert (ra, ta, tra) == (rb, tb, trb)
        if ta or tra:
            oa, _ = a.reset()
            ob, _ = b.reset()
            np.testing.assert_array_equal(oa["image"], ob["image"])


def test_sync_vector_env():
    """The reference's only multi-env path (tests/test_envs.py:317-329)."""
    num_envs = 4
    env = gym.vector.SyncVectorEnv(
        [lambda: gym_make("MiniGrid-Empty-5x5-v0") for _ in range(num_envs)]
    )
    obs, _ = env.reset(seed=0)
    assert obs["image"].shape == (num_envs, 7, 7, 3)
    obs, rewards, terms, truncs, _ = env.step(
        np.zeros(num_envs, dtype=np.int64)
    )
    assert rewards.shape == (num_envs,)
    env.close()


def test_gymnasium_registry_integration():
    """Literal gymnasium.make works after registration (the reference wires
    this as a package entry point)."""
    from minigrid_tpu.compat import register_gymnasium_envs

    n = register_gymnasium_envs()
    assert n >= 0  # idempotent on re-run
    env = gym.make("MiniGrid-Empty-5x5-v0")
    obs, _ = env.reset(seed=0)
    assert obs["image"].shape == (7, 7, 3)
    obs, r, te, tr, _ = env.step(2)
    env.close()

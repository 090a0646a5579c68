"""Drop-in parity through the gymnasium shim: with ``parity=True`` the
adapter reproduces the reference env's full gymnasium behavior under both
seeded and UNSEEDED resets (the host RNG stream continues across episodes
exactly like the reference's ``np_random``)."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "minigrid")),
    reason="reference checkout not available",
)

if os.path.isdir(os.path.join(REFERENCE, "minigrid")):
    sys.path.insert(0, REFERENCE)
    os.environ.setdefault("SDL_VIDEODRIVER", "dummy")


@pytest.mark.parametrize(
    "env_id",
    [
        "MiniGrid-DoorKey-8x8-v0",
        "MiniGrid-Dynamic-Obstacles-6x6-v0",
        "MiniGrid-FourRooms-v0",
        "BabyAI-GoToLocal-v0",
        "BabyAI-OpenTwoDoors-v0",
        "MiniGrid-WFC-MazeSimple-v0",
    ],
)
def test_gym_shim_parity_episode_chain(env_id):
    import gymnasium as gym
    import minigrid

    minigrid.register_minigrid_envs()
    from minigrid_tpu.compat.gym import gym_make

    ref = gym.make(env_id).unwrapped
    ours = gym_make(env_id, parity=True)
    rng = np.random.default_rng(7)

    ro, _ = ref.reset(seed=123)
    oo, _ = ours.reset(seed=123)
    for ep in range(3):
        assert np.array_equal(ro["image"], oo["image"]), (env_id, ep)
        assert ro["mission"] == oo["mission"]
        assert ref.max_steps == ours.max_steps
        for t in range(50):
            a = int(rng.integers(0, 7))
            ro, rr, rterm, rtrunc, _ = ref.step(a)
            oo, orr, oterm, otrunc, _ = ours.step(a)
            assert np.array_equal(ro["image"], oo["image"]), (env_id, ep, t)
            assert abs(rr - orr) < 1e-6
            assert rterm == oterm and rtrunc == otrunc
            if rterm or rtrunc:
                break
        ro, _ = ref.reset()  # unseeded: RNG stream continues
        oo, _ = ours.reset()


def test_view_query_api_parity():
    """agent_sees / in_view / front_pos / dir_vec / steps_remaining parity:
    the shim's view-coordinate queries (reference minigrid_env.py:398-523)
    must agree with the reference on every non-empty cell of every step of a
    live episode, including occlusion judged through the encoded obs."""
    import gymnasium as gym
    import minigrid

    minigrid.register_minigrid_envs()
    from minigrid_tpu.compat.gym import gym_make

    env_id = "MiniGrid-DoorKey-6x6-v0"
    ref = gym.make(env_id).unwrapped
    ours = gym_make(env_id, parity=True)
    ref.reset(seed=42)
    ours.reset(seed=42)

    rng = np.random.default_rng(0)
    for t in range(40):
        assert np.array_equal(ours.dir_vec, ref.dir_vec)
        assert np.array_equal(ours.right_vec, ref.right_vec)
        assert np.array_equal(ours.front_pos, ref.front_pos)
        assert ours.steps_remaining == ref.steps_remaining
        for x in range(ref.width):
            for y in range(ref.height):
                assert ours.in_view(x, y) == ref.in_view(x, y), (t, x, y)
                if ref.grid.get(x, y) is None:
                    continue  # reference agent_sees asserts on empty cells
                assert ours.agent_sees(x, y) == ref.agent_sees(x, y), (t, x, y)
                assert ours.relative_coords(x, y) == ref.relative_coords(x, y)
        a = int(rng.integers(0, 7))
        _, _, term, trunc, _ = ref.step(a)
        ours.step(a)
        if term or trunc:
            break

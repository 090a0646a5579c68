"""Demonstration generation with the oracle bot.

The reference's BabyAIBot exists to generate expert demonstrations for
imitation learning (reference: minigrid/utils/baby_ai_bot.py:549-562, "used
for demonstration generation and as the test oracle").  This module drives
the bot over any BabyAI level and collects (observation, action) trajectories
as stacked arrays ready for a BC/DAgger data pipeline.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np

from minigrid_tpu.utils.babyai_bot import BabyAIBot, DisappearedBoxError


class Demo(NamedTuple):
    images: np.ndarray  # uint8[T, v, v, 3]
    directions: np.ndarray  # int32[T]
    missions: np.ndarray  # int32[T, MISSION_DIM]
    actions: np.ndarray  # int32[T]
    reward: float
    seed: int


def generate_demo(env, seed: int, max_steps: int = 600) -> Demo | None:
    """One expert episode; None if the bot fails on this seed."""
    reset = jax.jit(env.reset)
    step = jax.jit(env.step_env)
    obs, state = reset(jax.random.PRNGKey(seed))
    bot = BabyAIBot(env, state)
    images, dirs, missions, actions = [], [], [], []
    last_action = None
    for _ in range(max_steps):
        try:
            action = bot.replan(state, last_action)
        except (DisappearedBoxError, RuntimeError, AssertionError):
            return None
        images.append(np.asarray(obs["image"]))
        dirs.append(int(obs["direction"]))
        missions.append(np.asarray(obs["mission"]))
        actions.append(action)
        state, reward = step(state, action)
        obs = env.observation(state)
        last_action = action
        if bool(state.terminated):
            if float(reward) <= 0:
                return None
            return Demo(
                np.stack(images),
                np.asarray(dirs, np.int32),
                np.stack(missions),
                np.asarray(actions, np.int32),
                float(reward),
                seed,
            )
        if bool(state.truncated):
            return None
    return None


def generate_demos(env, num_demos: int, start_seed: int = 0, max_steps: int = 600):
    """Collect ``num_demos`` successful expert episodes (skipping seeds the
    bot cannot solve, like the reference's seed-retry loop in
    tests/test_baby_ai_bot.py:38-56)."""
    demos: list[Demo] = []
    seed = start_seed
    while len(demos) < num_demos:
        demo = generate_demo(env, seed, max_steps)
        if demo is not None:
            demos.append(demo)
        seed += 1
    return demos

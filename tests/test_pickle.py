"""Pickling conformance (reference: tests/test_envs.py:174-184 — every env
pickles and the clone behaves identically).

Here that contract covers three surfaces:
  * the functional env family (pure config object),
  * the ``EnvState`` pytree (save/load round-trip beyond TrainState),
  * the gymnasium shim — which holds jitted closures and therefore needs the
    ``__getstate__``/``__setstate__`` hooks in compat/gym.py — in both normal
    and parity mode, mid-episode.
"""

from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.compat.gym import gym_make

# One representative per interaction class: plain, carrying/doors, RoomGrid,
# BabyAI (mission + verifier planes), and the step-RNG family.
PICKLE_IDS = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-KeyCorridorS3R2-v0",
    "BabyAI-GoToLocal-v0",
    "MiniGrid-Dynamic-Obstacles-8x8-v0",
]


def _obs_equal(a, b):
    assert np.array_equal(a["image"], b["image"])
    assert a["direction"] == b["direction"]
    assert a["mission"] == b["mission"]


@pytest.mark.parametrize("env_id", PICKLE_IDS)
def test_pickle_env_family(env_id):
    env = mg.make(env_id)
    env2 = pickle.loads(pickle.dumps(env))
    key = jax.random.PRNGKey(7)
    obs1, s1 = env.reset(key)
    obs2, s2 = env2.reset(key)
    for l1, l2 in zip(jax.tree.leaves((obs1, s1)), jax.tree.leaves((obs2, s2))):
        assert np.array_equal(l1, l2)


@pytest.mark.parametrize("env_id", PICKLE_IDS)
def test_pickle_env_state(env_id):
    """EnvState pytrees round-trip through pickle bit-exactly and the clone
    steps identically to the original."""
    env = mg.make(env_id)
    _, state = env.reset(jax.random.PRNGKey(3))
    state2 = pickle.loads(pickle.dumps(state))
    for l1, l2 in zip(jax.tree.leaves(state), jax.tree.leaves(state2)):
        assert np.array_equal(l1, l2)
    a = jnp.int32(2)
    n1, r1 = env.step_env(state, a)
    n2, r2 = env.step_env(state2, a)
    assert float(r1) == float(r2)
    for l1, l2 in zip(jax.tree.leaves(n1), jax.tree.leaves(n2)):
        assert np.array_equal(l1, l2)


@pytest.mark.parametrize("env_id", PICKLE_IDS)
def test_pickle_gym_shim_mid_episode(env_id):
    """The shim pickles mid-episode (jitted closures and pygame handles are
    dropped and rebuilt) and the clone's next transitions match exactly."""
    env = gym_make(env_id)
    env.reset(seed=5)
    for a in (2, 0, 2):
        env.step(a)
    clone = pickle.loads(pickle.dumps(env))
    for a in (2, 1, 2, 2, 5, 2):
        o1, r1, t1, u1, _ = env.step(a)
        o2, r2, t2, u2, _ = clone.step(a)
        _obs_equal(o1, o2)
        assert (r1, t1, u1) == (r2, t2, u2)
        if t1 or u1:
            break
    env.close()
    clone.close()


def test_pickle_gym_shim_parity_mode():
    """Parity mode carries a host RNG stream + ParityRollout (which holds a
    jitted closure of its own); the pickled clone must continue the same
    reference-exact episode, including the reset that follows."""
    env = gym_make("MiniGrid-DoorKey-5x5-v0", parity=True)
    env.reset(seed=11)
    for a in (2, 1):
        env.step(a)
    clone = pickle.loads(pickle.dumps(env))
    for a in (2, 0, 2, 2):
        o1, r1, t1, u1, _ = env.step(a)
        o2, r2, t2, u2, _ = clone.step(a)
        _obs_equal(o1, o2)
        assert (r1, t1, u1) == (r2, t2, u2)
    o1, _ = env.reset(seed=23)
    o2, _ = clone.reset(seed=23)
    _obs_equal(o1, o2)
    env.close()
    clone.close()

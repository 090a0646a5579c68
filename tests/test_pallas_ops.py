"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU; the same comparison runs compiled on real TPU via
tools/test_pallas_obs.py, where it matched bit-exactly on 2048 random
DoorKey states)."""

from __future__ import annotations

import jax
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core.constants import unpack_grid
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.ops.obs_pallas import fused_obs_packed
from minigrid_tpu.parallel.vector import rollout_random


@pytest.mark.parametrize("env_id", ["MiniGrid-DoorKey-5x5-v0", "MiniGrid-Empty-8x8-v0"])
def test_fused_obs_matches_xla(env_id):
    env = mg.make(env_id)
    n = 64
    key = jax.random.PRNGKey(0)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, n))
    states, _, _ = rollout_random(env, states, key, 25)

    ref = np.asarray(
        jax.jit(jax.vmap(lambda s: gen_obs_image(s, 7, env.see_through_walls)))(states)
    )
    packed = fused_obs_packed(
        states.grid,
        states.agent_x,
        states.agent_y,
        states.agent_dir,
        states.carrying,
        7,
        env.see_through_walls,
        block=n,
        interpret=True,
    )
    got = np.asarray(unpack_grid(packed))
    np.testing.assert_array_equal(got, ref)

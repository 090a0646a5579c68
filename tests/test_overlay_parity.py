"""Bit-exact parity for envs with family-specific step overlays
(Fetch/GoTo*/PutNear/Memory/RedBlueDoors): replay reference transitions
through env.step_env with the recorded target metadata in state.extra."""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core.constants import pack_carry, unpack_grid
from minigrid_tpu.core.obs import gen_obs_image
from minigrid_tpu.core.state import new_state

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
OVERLAY_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "overlay_*.npz")))


def _load(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _env_id(path):
    return os.path.basename(path)[len("overlay_") : -len(".npz")]


@pytest.mark.parametrize("path", OVERLAY_FILES, ids=_env_id)
def test_overlay_step_parity(path):
    d = _load(path)
    env = mg.make(_env_id(path))
    max_steps = int(d["max_steps"])
    view = int(d["agent_view_size"])
    stw = bool(d["see_through_walls"])
    extra_keys = [k[len("extra_") :] for k in d if k.startswith("extra_")]

    def run_one(grid, contains, pos, direction, carry, step_count, action, extra):
        state = new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=jax.random.PRNGKey(0),
            max_steps=max_steps,
            contains=contains,
            extra=extra,
        )
        carry = carry.astype(jnp.int32)
        state = state.replace(
            carrying=pack_carry(carry[0], carry[1], carry[2], carry[3]),
            step_count=jnp.asarray(step_count, jnp.int32),
        )
        state, reward = env.step_env(state, action)
        obs = gen_obs_image(state, view, stw)
        carry_out = jnp.stack(
            [
                state.carrying & 0xFF,
                (state.carrying >> 8) & 0xFF,
                (state.carrying >> 16) & 0xFF,
                (state.carrying >> 24) & 0xFF,
            ]
        ).astype(jnp.uint8)
        return (
            unpack_grid(state.grid), state.agent_pos, state.agent_dir, carry_out,
            reward, state.terminated, state.truncated, obs,
        )

    extra = {k: jnp.asarray(d["extra_" + k]) for k in extra_keys}
    out = jax.jit(jax.vmap(run_one))(
        jnp.asarray(d["grid_pre"]),
        jnp.asarray(d["contains_pre"]),
        jnp.asarray(d["pos_pre"]),
        jnp.asarray(d["dir_pre"]),
        jnp.asarray(d["carry_pre"]),
        jnp.asarray(d["step_count_pre"]),
        jnp.asarray(d["action"]),
        extra,
    )
    grid, pos, direction, carry, reward, term, trunc, obs = map(np.asarray, out)

    np.testing.assert_array_equal(grid, d["grid_post"], err_msg="grid")
    np.testing.assert_array_equal(pos, d["pos_post"], err_msg="pos")
    np.testing.assert_array_equal(direction, d["dir_post"], err_msg="dir")
    np.testing.assert_array_equal(carry, d["carry_post"], err_msg="carry")
    np.testing.assert_allclose(reward, d["reward"], rtol=1e-6, err_msg="reward")
    np.testing.assert_array_equal(term, d["terminated"], err_msg="terminated")
    np.testing.assert_array_equal(trunc, d["truncated"], err_msg="truncated")
    np.testing.assert_array_equal(obs, d["obs_image"], err_msg="obs")

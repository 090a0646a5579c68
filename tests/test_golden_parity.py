"""Bit-exact parity against fixtures recorded from the reference Minigrid.

Fixtures are produced by tools/gen_golden.py running the actual reference
implementation; these tests replay every recorded transition through the
TPU-native engine and require identical grids, poses, rewards, flags, and
encoded observations.
"""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minigrid_tpu.core.constants import pack_carry, see_behind, unpack_grid
from minigrid_tpu.core.obs import gen_obs_image, process_vis
from minigrid_tpu.core.state import new_state
from minigrid_tpu.core.step import core_step

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
STEP_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "steps_*.npz")))


def _load(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize("path", STEP_FILES, ids=lambda p: os.path.basename(p))
def test_step_and_obs_parity(path):
    d = _load(path)
    n = d["action"].shape[0]
    max_steps = int(d["max_steps"])
    view = int(d["agent_view_size"])
    stw = bool(d["see_through_walls"])

    def run_one(grid, contains, pos, direction, carry, step_count, action):
        state = new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=jax.random.PRNGKey(0),
            max_steps=max_steps,
            contains=contains,
        )
        carry = carry.astype(jnp.int32)
        state = state.replace(
            carrying=pack_carry(carry[0], carry[1], carry[2], carry[3]),
            step_count=jnp.asarray(step_count, jnp.int32),
        )
        state, reward = core_step(state, action)
        obs = gen_obs_image(state, view, stw)
        carry_out = jnp.stack(
            [
                state.carrying & 0xFF,
                (state.carrying >> 8) & 0xFF,
                (state.carrying >> 16) & 0xFF,
                (state.carrying >> 24) & 0xFF,
            ]
        ).astype(jnp.uint8)
        contains_out = jnp.stack(
            [state.contains & 0xFF, (state.contains >> 8) & 0xFF], axis=-1
        ).astype(jnp.uint8)
        return (
            unpack_grid(state.grid),
            contains_out,
            state.agent_pos,
            state.agent_dir,
            carry_out,
            reward,
            state.terminated,
            state.truncated,
            obs,
        )

    run = jax.jit(jax.vmap(run_one))
    out = run(
        jnp.asarray(d["grid_pre"]),
        jnp.asarray(d["contains_pre"]),
        jnp.asarray(d["pos_pre"]),
        jnp.asarray(d["dir_pre"]),
        jnp.asarray(d["carry_pre"]),
        jnp.asarray(d["step_count_pre"]),
        jnp.asarray(d["action"]),
    )
    grid, contains, pos, direction, carry, reward, term, trunc, obs = map(
        np.asarray, out
    )

    np.testing.assert_array_equal(grid, d["grid_post"], err_msg=f"{path}: grid")
    np.testing.assert_array_equal(
        contains, d["contains_post"], err_msg=f"{path}: contains"
    )
    np.testing.assert_array_equal(pos, d["pos_post"], err_msg=f"{path}: pos")
    np.testing.assert_array_equal(direction, d["dir_post"], err_msg=f"{path}: dir")
    np.testing.assert_array_equal(carry, d["carry_post"], err_msg=f"{path}: carry")
    np.testing.assert_allclose(
        reward, d["reward"], rtol=1e-6, err_msg=f"{path}: reward"
    )
    np.testing.assert_array_equal(term, d["terminated"], err_msg=f"{path}: term")
    np.testing.assert_array_equal(trunc, d["truncated"], err_msg=f"{path}: trunc")
    np.testing.assert_array_equal(obs, d["obs_image"], err_msg=f"{path}: obs")


def test_process_vis_parity():
    d = _load(os.path.join(GOLDEN_DIR, "process_vis.npz"))
    grids = jnp.asarray(d["grids"])  # [N, v, v, 3]
    trans = see_behind(grids[..., 0], grids[..., 2])
    masks = np.asarray(jax.jit(jax.vmap(process_vis))(trans))
    np.testing.assert_array_equal(masks, d["masks"])

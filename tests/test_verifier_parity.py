"""BabyAI verifier parity: replay reference episodes through the TPU
engine's step + instruction state machine.

Fixtures (tools/gen_verifier_golden.py) record, from the ACTUAL reference
implementation, the initial grid/pose, the serialized instruction tree, the
action sequence, and per-step (reward, terminated).  Since core_step is
bit-parity-tested separately, identical (reward, terminated) sequences here
pin the entire verifier semantics: descriptor matching (type/color/location),
object identity tracking through pickup/drop, PutNext adjacency, Before/After
/And sequencing and strict-mode failures (reference verifier.py:49-566,
roomgrid_level.py:86-103)."""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minigrid_tpu.core.env import success_reward
from minigrid_tpu.core.roomgrid import RoomGridBuilder
from minigrid_tpu.core.state import new_state
from minigrid_tpu.core.step import core_step
from minigrid_tpu.envs.babyai.core.instr import (
    S_FAILURE,
    S_SUCCESS,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
    verify_step,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "verifier_*.npz")))


def _build_instr(rec, grid, pos, direction, room_mask, done_mode=False):
    instr = empty_instr(grid.shape[0], grid.shape[1], done_mode=done_mode)
    leaves = rec["leaves"]
    instr = set_top(
        instr,
        int(rec["top"]),
        a_is_and=bool(rec["a_is_and"]),
        b_is_and=bool(rec["b_is_and"]),
        strict=bool(rec["strict"]),
    )
    for leaf in range(4):
        kind = int(leaves[leaf, 0])
        if kind < 0 and leaves[leaf, 1] < 0:
            continue
        if leaves[leaf, 0] == -1 and (leaves[leaf] == -1).all():
            continue
        instr = set_leaf(instr, leaf, kind, strict=bool(leaves[leaf, 1]))
        instr = set_desc(
            instr, leaf, 0, grid, pos, direction,
            int(leaves[leaf, 2]), int(leaves[leaf, 3]), int(leaves[leaf, 4]),
            agent_room_mask=room_mask,
        )
        if leaves[leaf, 5] >= 0:
            instr = set_desc(
                instr, leaf, 1, grid, pos, direction,
                int(leaves[leaf, 5]), int(leaves[leaf, 6]), int(leaves[leaf, 7]),
                agent_room_mask=room_mask,
            )
    return instr


def _replay(rec, done_mode=False):
    grid = jnp.asarray(rec["grid"])  # uint8 [W, H, 3] -> packed by new_state
    state = new_state(
        grid=grid,
        agent_pos=rec["pos"],
        agent_dir=int(rec["dir"]),
        rng=jax.random.PRNGKey(0),
        max_steps=int(rec["max_steps"]),
    )
    room_mask = None
    if int(rec["room_size"]) > 0:
        b = RoomGridBuilder(
            int(rec["room_size"]), int(rec["num_rows"]), int(rec["num_cols"])
        )
        ai, aj = b.room_of_pos(state.agent_x, state.agent_y)
        room_mask = b.room_interior_mask(ai, aj)
    instr = _build_instr(
        rec, state.grid, state.agent_pos, state.agent_dir, room_mask,
        done_mode=done_mode,
    )

    @jax.jit
    def step_one(state, instr, action):
        prev = state
        state, reward = core_step(state, action)
        instr, status = verify_step(instr, prev, state, action)
        reward = jnp.where(status == S_SUCCESS, success_reward(state), reward)
        reward = jnp.where(status == S_FAILURE, 0.0, reward)
        terminated = state.terminated | (status != 0)
        return state.replace(terminated=terminated), instr, reward, terminated

    rewards, terms = [], []
    for a in rec["actions"]:
        state, instr, reward, terminated = step_one(state, instr, int(a))
        rewards.append(float(reward))
        terms.append(bool(terminated))
        if terms[-1] or bool(state.truncated):
            break
    return np.asarray(rewards, np.float32), np.asarray(terms, bool)


@pytest.mark.parametrize("path", FILES, ids=lambda p: os.path.basename(p))
def test_verifier_parity(path):
    with np.load(path) as z:
        data = {k: z[k] for k in z.files}
    n = int(data["num_eps"])
    done_mode = bool(data.get("done_mode", False))
    for i in range(n):
        rec = {k[len(f"ep{i}_"):]: v for k, v in data.items() if k.startswith(f"ep{i}_")}
        rewards, terms = _replay(rec, done_mode=done_mode)
        np.testing.assert_array_equal(
            terms, rec["terminated"], err_msg=f"{path} ep{i}: terminated"
        )
        np.testing.assert_allclose(
            rewards, rec["rewards"], rtol=1e-6, err_msg=f"{path} ep{i}: reward"
        )

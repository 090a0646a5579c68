"""Wrapper and renderer parity vs reference golden fixtures, plus functional
checks for the stateful wrappers (model: reference tests/test_wrappers.py)."""

from __future__ import annotations

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core.constants import pack_carry
from minigrid_tpu.core.state import new_state


def _pack4(carry):
    c = jnp.asarray(carry, jnp.int32)
    return pack_carry(c[0], c[1], c[2], c[3])
from minigrid_tpu.wrappers import (
    ActionBonus,
    DictObservationSpaceWrapper,
    FlatObsWrapper,
    FullyObsWrapper,
    ImgObsWrapper,
    NoDeath,
    OneHotPartialObsWrapper,
    PositionBonus,
    ReseedWrapper,
    RGBImgObsWrapper,
    RGBImgPartialObsWrapper,
    StochasticActionWrapper,
    SymbolicObsWrapper,
    ViewSizeWrapper,
)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
WRAPPER_FILES = sorted(glob.glob(os.path.join(GOLDEN_DIR, "wrappers_*.npz")))


def _load(path):
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


def _states_from(d, env, n):
    """Rebuild a batch of EnvStates from fixture arrays."""
    _, ref_state = env.reset(jax.random.PRNGKey(0))

    def build(grid, contains, pos, direction, carry):
        s = new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=jax.random.PRNGKey(0),
            max_steps=env.max_steps,
            contains=contains,
            mission=ref_state.mission,
            extra=jax.tree.map(jnp.zeros_like, ref_state.extra),
        )
        return s.replace(carrying=_pack4(carry))

    return jax.vmap(build)(
        jnp.asarray(d["grid"][:n]),
        jnp.asarray(d["contains"][:n]),
        jnp.asarray(d["pos"][:n]),
        jnp.asarray(d["dir"][:n]),
        jnp.asarray(d["carry"][:n]),
    )


@pytest.mark.parametrize(
    "path", WRAPPER_FILES, ids=lambda p: os.path.basename(p)[len("wrappers_") : -4]
)
def test_wrapper_obs_parity(path):
    d = _load(path)
    env_id = os.path.basename(path)[len("wrappers_") : -len(".npz")]
    env = mg.make(env_id)
    n = d["grid"].shape[0]
    states = _states_from(d, env, n)

    cases = [
        ("fully", FullyObsWrapper(env), "image", None),
        ("onehot", OneHotPartialObsWrapper(env), "image", None),
        ("symbolic", SymbolicObsWrapper(env), "image", np.int32),
        ("dict_mission", DictObservationSpaceWrapper(env), "mission", np.int32),
        ("flat", FlatObsWrapper(env), None, None),
        ("view5", ViewSizeWrapper(env, agent_view_size=5), "image", None),
        ("rgb_full", RGBImgObsWrapper(env, tile_size=8), "image", None),
        ("rgb_pov", RGBImgPartialObsWrapper(env, tile_size=8), "image", None),
    ]
    for name, wrapper, field, cast in cases:
        out = jax.jit(jax.vmap(wrapper.observation))(states)
        if field is not None:
            out = out[field]
        out = np.asarray(out)
        if cast is not None:
            out = out.astype(cast)
        expected = d[name]
        np.testing.assert_array_equal(out, expected, err_msg=f"{env_id}:{name}")


def test_nodeath_parity():
    d = _load(os.path.join(GOLDEN_DIR, "nodeath_lava.npz"))
    env = mg.make("MiniGrid-LavaCrossingS9N1-v0")
    wrapped = NoDeath(env, no_death_types=("lava",), death_cost=-1.0)
    max_steps = int(d["max_steps"])

    def run_one(grid, contains, pos, direction, carry, step_count, action):
        s = new_state(
            grid=grid,
            agent_pos=pos,
            agent_dir=direction,
            rng=jax.random.PRNGKey(0),
            max_steps=max_steps,
            contains=contains,
        )
        s = s.replace(carrying=_pack4(carry), step_count=jnp.asarray(step_count, jnp.int32))
        stepped, reward = wrapped.step_env(s, action)
        return reward, stepped.terminated, stepped.truncated

    reward, term, trunc = jax.jit(jax.vmap(run_one))(
        jnp.asarray(d["grid"]),
        jnp.asarray(d["contains"]),
        jnp.asarray(d["pos"]),
        jnp.asarray(d["dir"]),
        jnp.asarray(d["carry"]),
        jnp.asarray(d["step_count"]),
        jnp.asarray(d["action"]),
    )
    np.testing.assert_allclose(np.asarray(reward), d["reward"], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(term), d["terminated"])
    np.testing.assert_array_equal(np.asarray(trunc), d["truncated"])


def test_img_obs_wrapper():
    env = ImgObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"))
    obs, state = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (7, 7, 3)
    obs, state, *_ = jax.jit(env.step)(state, jnp.asarray(2))
    assert obs.shape == (7, 7, 3)


def test_position_bonus_arithmetic():
    # First visit to a position gives 1.0, second gives 1/sqrt(2)
    # (reference: tests/test_wrappers.py PositionBonus cases).
    env = PositionBonus(mg.make("MiniGrid-Empty-5x5-v0"))
    _, wstate = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    _, wstate, r1, *_ = step(wstate, jnp.asarray(1))  # turn: stays at pos
    _, wstate, r2, *_ = step(wstate, jnp.asarray(1))
    assert np.isclose(float(r1), 1.0)
    assert np.isclose(float(r2), 1.0 / np.sqrt(2.0))


def test_action_bonus_arithmetic():
    env = ActionBonus(mg.make("MiniGrid-Empty-5x5-v0"))
    _, wstate = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    _, wstate, r1, *_ = step(wstate, jnp.asarray(6))  # done: no state change
    _, wstate, r2, *_ = step(wstate, jnp.asarray(6))
    assert np.isclose(float(r1), 1.0)
    assert np.isclose(float(r2), 1.0 / np.sqrt(2.0))


def test_reseed_wrapper_cycles():
    env = ReseedWrapper(mg.make("MiniGrid-Empty-Random-5x5-v0"), seeds=[7, 8])
    obs_a, sa = env.reset()
    obs_b, sb = env.reset()
    obs_a2, sa2 = env.reset()
    assert np.array_equal(np.asarray(sa.grid), np.asarray(sa2.grid))
    assert np.array_equal(np.asarray(sa.agent_pos), np.asarray(sa2.agent_pos))


def test_stochastic_action_deterministic_at_prob_1():
    env = StochasticActionWrapper(mg.make("MiniGrid-Empty-5x5-v0"), prob=1.0)
    _, state = env.reset(jax.random.PRNGKey(0))
    _, state2, *_ = env.step(state, jnp.asarray(2))  # forward
    assert np.asarray(state2.agent_pos)[0] == 2


def test_direction_obs_wrapper_arithmetic():
    """DirectionObsWrapper reproduces the reference's quirky row-major slope
    arithmetic (minigrid/wrappers.py:697-716): goal cell derived from the
    flattened grid index as (idx // height, idx % width), slope =
    (goal[1] - agent_y) / (goal[0] - agent_x)."""
    from minigrid_tpu.wrappers import DirectionObsWrapper

    env = mg.make("MiniGrid-Empty-5x5-v0")
    w = DirectionObsWrapper(env, type="slope")
    _, state = env.reset(jax.random.PRNGKey(0))
    o = jax.jit(w.observation)(state)
    # Empty-5x5: goal at (3, 3), agent at (1, 1) dir 0.  Reference flat index
    # (y * w + x) = 18 -> goal = (18 // 5, 18 % 5) = (3, 3); slope =
    # (3 - 1)/(3 - 1) = 1.0 (matches the reference doctest's 1.0).
    assert np.isclose(float(o["goal_direction"]), 1.0)
    wa = DirectionObsWrapper(env, type="angle")
    oa = jax.jit(wa.observation)(state)
    assert np.isclose(float(oa["goal_direction"]), np.arctan(1.0))


def test_direction_obs_wrapper_tracks_moving_goal():
    """DELIBERATE deviation from the reference (decided + pinned here): the
    reference caches the FIRST episode's goal position forever
    (minigrid/wrappers.py:694-706 `if not self.goal_position`), so after a
    reset that moves the goal it reports directions to a stale cell.  The
    functional wrapper recomputes from the live grid each observation —
    identical output for every static-goal env the wrapper targets, correct
    (rather than stale) output when the goal moves."""
    from minigrid_tpu.core.constants import EMPTY_CELL, GOAL_CELL
    from minigrid_tpu.core import grid as g
    from minigrid_tpu.wrappers import DirectionObsWrapper

    env = mg.make("MiniGrid-Empty-5x5-v0")
    w = DirectionObsWrapper(env, type="slope")
    _, state = env.reset(jax.random.PRNGKey(0))
    # Move the goal from (3, 3) to (1, 3): flat idx 3*5+1 = 16, quirk-goal
    # (16 // 5, 16 % 5) = (3, 1), slope = (1 - 1)/(3 - 1) = 0.0 (the cached
    # reference would still report 1.0 toward the stale first-episode goal).
    grid = g.set_cell(state.grid, 3, 3, EMPTY_CELL)
    grid = g.set_cell(grid, 1, 3, GOAL_CELL)
    moved = state.replace(grid=grid)
    o = jax.jit(w.observation)(moved)
    assert np.isclose(float(o["goal_direction"]), 0.0)

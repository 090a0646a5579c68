"""Per-env conformance tests over the registry (model: reference
tests/test_envs.py — spec-parametrized determinism + invariant checks).

Every env id costs one fresh XLA compile on the CPU test backend, so the
default sweep covers all classic MiniGrid ids plus BabyAI/WFC family
representatives; set MINIGRID_TPU_FULL=1 to sweep all 177 registered ids
(each test below does its determinism AND invariant checks on ONE compiled
batched reset per id).
"""

from __future__ import annotations

import os
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_FLOOR,
    OBJ_GOAL,
    OBJ_KEY,
    OBJ_LAVA,
    OBJ_WALL,
)

ALL_IDS = mg.registered_ids()
_BABYAI_REPS = [
    "BabyAI-GoToRedBallGrey-v0",
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoTo-v0",
    "BabyAI-OpenRedDoor-v0",
    "BabyAI-OpenDoorsOrderN2-v0",
    "BabyAI-PickupLoc-v0",
    "BabyAI-PutNextLocalS5N3-v0",
    "BabyAI-UnlockLocal-v0",
    "BabyAI-UnlockToUnlock-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-FindObjS5-v0",
    "BabyAI-Synth-v0",
    "BabyAI-KeyInBox-v0",
    "BabyAI-PutNextS5N2Carrying-v0",
]
if os.environ.get("MINIGRID_TPU_FULL"):
    SWEEP_IDS = ALL_IDS
else:
    SWEEP_IDS = [
        i for i in ALL_IDS if not i.startswith("BabyAI-")
    ] + _BABYAI_REPS


def tree_equal(a, b) -> bool:
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b))


@pytest.mark.parametrize("env_id", SWEEP_IDS)
def test_generate_deterministic_and_invariants(env_id):
    env = mg.make(env_id)
    reset = jax.jit(jax.vmap(env.reset))
    key42 = jax.random.PRNGKey(42)
    keys = jnp.concatenate(
        [key42[None], key42[None], jax.random.split(jax.random.PRNGKey(0), 30)]
    )
    _, states = reset(keys)

    # Determinism: identical keys produce identical episodes (rows 0 and 1).
    s1 = jax.tree.map(lambda a: a[0], states)
    s2 = jax.tree.map(lambda a: a[1], states)
    assert tree_equal(s1, s2)

    from minigrid_tpu.core.constants import unpack_grid

    grids = np.asarray(unpack_grid(states.grid))
    pos = np.asarray(states.agent_pos)
    dirs = np.asarray(states.agent_dir)

    # Boundary is fully walled in every classic env (exceptions: GoToDoor
    # shrinks the room inside the grid, reference minigrid/envs/gotodoor.py:96-100;
    # MultiRoom only outlines its room chain, multiroom.py:146-160).
    if "GoToDoor" not in env_id and "MultiRoom" not in env_id:
        assert (grids[:, 0, :, 0] == OBJ_WALL).all()
        assert (grids[:, -1, :, 0] == OBJ_WALL).all()
        assert (grids[:, :, 0, 0] == OBJ_WALL).all()
        assert (grids[:, :, -1, 0] == OBJ_WALL).all()

    # Cell vocabulary is valid (no "unseen"/"agent" markers in world grids).
    assert grids[..., 0].min() >= OBJ_EMPTY
    assert grids[..., 0].max() <= OBJ_LAVA
    assert grids[..., 1].max() < 6
    assert (dirs >= 0).all() and (dirs < 4).all()

    # Agent stands on an overlappable cell (reference: minigrid_env.py:141-143).
    n = grids.shape[0]
    agent_cells = grids[np.arange(n), pos[:, 0], pos[:, 1]]
    overlappable = np.isin(agent_cells[:, 0], [OBJ_EMPTY, OBJ_FLOOR, OBJ_GOAL, OBJ_LAVA]) | (
        (agent_cells[:, 0] == OBJ_DOOR) & (agent_cells[:, 2] == 0)
    )
    assert overlappable.all()


def _solvable(grid: np.ndarray, start: tuple[int, int]) -> bool:
    """Key-aware BFS reachability to a goal: a locked door is only passable
    once a key of the SAME COLOR is reachable (fixed point over unlock
    waves), so a DoorKey layout whose key is walled off fails the check.
    Lava and walls always block."""
    w, h = grid.shape[:2]
    base = np.isin(grid[..., 0], [OBJ_EMPTY, OBJ_FLOOR, OBJ_GOAL, OBJ_KEY, OBJ_BALL, OBJ_BOX])
    is_door = grid[..., 0] == OBJ_DOOR
    locked = is_door & (grid[..., 2] == 2)
    have_keys: set[int] = set()
    while True:
        openable = np.zeros((w, h), bool)
        for c in have_keys:
            openable |= locked & (grid[..., 1] == c)
        passable = base | (is_door & ~locked) | openable
        seen = np.zeros((w, h), bool)
        q = deque([start])
        seen[start] = True
        found_keys: set[int] = set()
        while q:
            x, y = q.popleft()
            if grid[x, y, 0] == OBJ_GOAL:
                return True
            if grid[x, y, 0] == OBJ_KEY:
                found_keys.add(int(grid[x, y, 1]))
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                nx, ny = x + dx, y + dy
                if 0 <= nx < w and 0 <= ny < h and not seen[nx, ny] and passable[nx, ny]:
                    seen[nx, ny] = True
                    q.append((nx, ny))
        if found_keys <= have_keys:
            return False
        have_keys |= found_keys


GOAL_ENVS = [i for i in ALL_IDS if any(
    k in i for k in ("Empty", "DoorKey", "FourRooms", "DistShift", "LavaGap", "Crossing")
)]


@pytest.mark.parametrize("env_id", GOAL_ENVS)
def test_always_solvable(env_id):
    env = mg.make(env_id)
    reset = jax.jit(jax.vmap(env.reset))
    _, states = reset(jax.random.split(jax.random.PRNGKey(7), 64))
    from minigrid_tpu.core.constants import unpack_grid

    grids = np.asarray(unpack_grid(states.grid))
    pos = np.asarray(states.agent_pos)
    for n in range(grids.shape[0]):
        assert _solvable(grids[n], tuple(pos[n])), f"{env_id} seed-batch idx {n} unsolvable"


@pytest.mark.parametrize("env_id", ["MiniGrid-Empty-5x5-v0", "MiniGrid-LavaGapS5-v0"])
def test_truncation_and_autoreset(env_id):
    env = mg.make(env_id)
    _, state = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    # Spin in place until truncation: max_steps 'done' actions.
    for t in range(int(state.max_steps)):
        obs, state, r, term, trunc = step(state, jnp.asarray(6))
    assert bool(trunc)
    # Auto-reset happened: fresh episode counters.
    assert int(state.step_count) == 0


# One representative per family — the rollout scan recompiles the full
# generate+step graph per id, so the smoke test covers families, while the
# cheaper reset-only tests above sweep every registered id.
FAMILY_REPS = [
    "MiniGrid-Empty-8x8-v0",
    "MiniGrid-Empty-Random-5x5-v0",
    "MiniGrid-DoorKey-8x8-v0",
    "MiniGrid-FourRooms-v0",
    "MiniGrid-DistShift1-v0",
    "MiniGrid-LavaGapS7-v0",
    "MiniGrid-LavaCrossingS9N2-v0",
    "MiniGrid-SimpleCrossingS11N5-v0",
    "MiniGrid-Dynamic-Obstacles-8x8-v0",
    "MiniGrid-Fetch-8x8-N3-v0",
    "MiniGrid-GoToDoor-8x8-v0",
    "MiniGrid-GoToObject-8x8-N2-v0",
    "MiniGrid-MemoryS13Random-v0",
    "MiniGrid-PutNear-8x8-N3-v0",
    "MiniGrid-RedBlueDoors-8x8-v0",
    "MiniGrid-Unlock-v0",
    "MiniGrid-UnlockPickup-v0",
    "MiniGrid-BlockedUnlockPickup-v0",
    "MiniGrid-KeyCorridorS3R3-v0",
    "MiniGrid-LockedRoom-v0",
    "MiniGrid-MultiRoom-N2-S4-v0",
    "MiniGrid-Playground-v0",
    "MiniGrid-ObstructedMaze-1Dlhb-v0",
    "MiniGrid-ObstructedMaze-2Dlhb-v1",
]


@pytest.mark.parametrize("env_id", FAMILY_REPS)
def test_rollout_smoke(env_id):
    from minigrid_tpu.parallel.vector import rollout_random

    env = mg.make(env_id)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(1), 8))
    states, total_r, total_done, _ = rollout_random(env, states, jax.random.PRNGKey(2), 50)
    assert np.isfinite(float(total_r))
    assert np.asarray(states.grid).shape[0] == 8


def test_distractor_overflow_invalidates_attempt():
    """A room with fewer free cells than requested distractors must flag the
    attempt infeasible (RoomGridState.ok False) instead of silently writing
    to an arbitrary cell — the traced counterpart of the reference's
    place_obj RecursionError retry (minigrid/minigrid_env.py:339-343).
    Regression: BabyAI-SynthS5R2 episodes grew border-cell objects when a
    random-room distractor's within-room rank exceeded room capacity."""
    from minigrid_tpu.core.roomgrid import RoomGridBuilder

    key = jax.random.PRNGKey(0)
    b = RoomGridBuilder(room_size=4, num_rows=1, num_cols=1)  # 2x2 interior
    s = b.init(jax.random.fold_in(key, 1))
    s = b.place_agent(jax.random.fold_in(key, 2), s)
    assert bool(s.ok)

    # Fixed-room path: more distractors than the room can hold.
    s_over, _, _, _ = b.add_distractors(
        jax.random.fold_in(key, 3), s, i=0, j=0, num_distractors=12, all_unique=False
    )
    assert not bool(s_over.ok)

    # Feasible count keeps ok True.
    s_ok, _, _, _ = b.add_distractors(
        jax.random.fold_in(key, 4), s, i=0, j=0, num_distractors=1, all_unique=False
    )
    assert bool(s_ok.ok)

    # Multi-room path: tiny 2-room lattice, overfill across random rooms.
    b2 = RoomGridBuilder(room_size=4, num_rows=1, num_cols=2)
    s2 = b2.init(jax.random.fold_in(key, 5))
    s2 = b2.place_agent(jax.random.fold_in(key, 6), s2)
    s2_over, _, _, _ = b2.add_distractors(
        jax.random.fold_in(key, 7), s2, num_distractors=18, all_unique=False
    )
    assert not bool(s2_over.ok)

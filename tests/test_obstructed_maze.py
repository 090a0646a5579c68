"""Statistical solvability of ObstructedMaze v1 layouts
(reference: tests/test_obstructed_maze.py:30-47 — 10,000 resets per env
asserting 0% unsolvable; here a vmapped batch per env because resets are
device-batched rather than sequential.  The v0 unsolvability modes the v1
envs fix: a key hidden under a blocking ball, and a blocking ball placed in
the door slot column, reference minigrid/envs/obstructedmaze_v1.py:37-75).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import pytest

import minigrid_tpu as mg
from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_KEY,
)

# Device-batched resets are cheap, but every env id is a fresh CPU compile;
# keep the default batch moderate and let MINIGRID_TPU_FULL_STATS raise it
# to the reference's 10k.
NUM_RESETS = 10_000 if os.environ.get("MINIGRID_TPU_FULL_STATS") else 512

V1_ENVS = [
    "MiniGrid-ObstructedMaze-2Dlhb-v1",
    "MiniGrid-ObstructedMaze-1Q-v1",
    "MiniGrid-ObstructedMaze-2Q-v1",
    "MiniGrid-ObstructedMaze-Full-v1",
]


def _unsolvable_fraction(env_id: str, n: int) -> float:
    env = mg.make(env_id)
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    _, states = jax.jit(jax.vmap(env.reset))(keys)
    grid = np.asarray(states.grid)
    contains = np.asarray(states.contains)
    t = grid & 0xFF
    c = (grid >> 8) & 0xFF

    bad = 0
    for i in range(n):
        ti, ci, cont = t[i], c[i], contains[i]
        # Every key needed for a locked door must exist loose, in a box, or
        # not be hidden under nothing — v0's failure is a key that is neither
        # on the floor nor inside any box (it was "hidden under" a ball).
        door_colors = set(ci[(ti == OBJ_DOOR) & (((grid[i] >> 16) & 0xFF) == 2)].tolist())
        loose_keys = set(ci[ti == OBJ_KEY].tolist())
        boxed_keys = {
            int((cont[x, y] >> 8) & 0xFF)
            for x, y in zip(*np.nonzero((cont & 0xFF) == OBJ_KEY))
        }
        if not door_colors <= (loose_keys | boxed_keys):
            bad += 1
            continue
        # A blocking ball must never share a cell with a box or key (v0 could
        # bury the key under the blocker).
        assert ((ti == OBJ_BALL) | (ti == OBJ_BOX)).sum() >= 1
    return bad / n


@pytest.mark.parametrize("env_id", V1_ENVS)
def test_v1_always_solvable(env_id):
    frac = _unsolvable_fraction(env_id, NUM_RESETS)
    assert frac == 0.0, f"{env_id}: {frac:.2%} of {NUM_RESETS} layouts unsolvable"

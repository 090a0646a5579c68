"""Live WFC seed parity vs the reference: same seed ⇒ bit-identical level.

Round-1 WFC validation was distributional (tests/test_wfc.py corpus tests);
this suite closes the gap to full bit-exactness by replaying the reference's
WFC solve host-side (compat/parity_wfc.py): the pattern catalog in reference
index order, the solver's exact RNG draw sequence, and the graph-stage
start/goal placement.  Runs the ACTUAL reference (mounted at /root/reference)
side by side; skipped when it is unavailable.
"""

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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from minigrid_tpu.compat.parity import parity_reset  # noqa: E402
from minigrid_tpu.compat.parity_wfc import _parity_tables  # noqa: E402
from minigrid_tpu.core.constants import unpack_grid  # noqa: E402
from minigrid_tpu.envs.wfc.preprocess import DIRECTIONS, WFC_PRESETS  # noqa: E402

PRESETS = list(WFC_PRESETS)  # the six the reference registers


def _ref_make(env_id):
    import gymnasium as gym
    import minigrid  # noqa: F401

    minigrid.register_minigrid_envs()
    return gym.make(env_id).unwrapped


@pytest.mark.parametrize("preset", PRESETS)
def test_catalog_parity(preset):
    """Pattern catalog in the reference's exact index (hash) order: same
    pattern count, per-index weights, and 4-direction adjacency matrices as
    the reference's own extraction pipeline (tiles.py/patterns.py/
    adjacency.py run live)."""
    from minigrid.envs.wfc.config import WFC_PRESETS as REF_PRESETS
    from minigrid.envs.wfc.wfclogic.adjacency import adjacency_extraction
    from minigrid.envs.wfc.wfclogic.patterns import (
        make_pattern_catalog_with_rotations,
    )
    from minigrid.envs.wfc.wfclogic.tiles import make_tile_catalog

    kw = REF_PRESETS[preset].wfc_kwargs
    _cat, tile_grid, _cl, _ut = make_tile_catalog(kw["image"], kw["tile_size"])
    pat_catalog, pat_weights, pat_list, pat_grid = make_pattern_catalog_with_rotations(
        tile_grid,
        kw["pattern_width"],
        input_is_periodic=kw["input_periodic"],
        rotations=kw["rotations"] - 1,
    )
    relations = adjacency_extraction(
        pat_grid, pat_catalog, list(enumerate(DIRECTIONS)), (kw["pattern_width"],) * 2
    )
    enc = {h: i for i, h in enumerate(pat_list)}
    P = len(pat_list)
    ref_adj = np.zeros((4, P, P), bool)
    dmap = {d: i for i, d in enumerate(DIRECTIONS)}
    for d, p1, p2 in relations:
        ref_adj[dmap[d], enc[p1], enc[p2]] = True
    ref_w = np.zeros(P)
    for h, w in pat_weights.items():
        ref_w[enc[h]] = w

    _pats, weights, adj, _wall = _parity_tables(WFC_PRESETS[preset])
    assert len(weights) == P
    assert np.array_equal(ref_w, weights)
    assert np.array_equal(ref_adj, adj)


@pytest.mark.parametrize("preset", PRESETS)
def test_reset_parity(preset):
    env_id = f"MiniGrid-WFC-{preset}-v0"
    ref = _ref_make(env_id)
    for seed in (0, 1, 7):
        ref.reset(seed=seed)
        env, state = parity_reset(env_id, seed)

        assert np.array_equal(np.asarray(unpack_grid(state.grid)), ref.grid.encode()), (
            f"{preset} seed={seed} grid mismatch"
        )
        assert tuple(np.asarray(state.agent_pos)) == tuple(ref.agent_pos)
        assert int(state.agent_dir) == ref.agent_dir
        assert int(state.max_steps) == ref.max_steps
        assert env.mission_text(state.mission) == ref.mission


def test_trajectory_parity():
    env_id = "MiniGrid-WFC-MazeSimple-v0"
    ref = _ref_make(env_id)
    seed = 3
    ref_obs, _ = ref.reset(seed=seed)
    env, state = parity_reset(env_id, seed)
    step_fn = jax.jit(env.step_env)

    action_rng = np.random.default_rng(seed + 1000)
    for t in range(60):
        action = int(action_rng.integers(0, 3))  # WFC uses nav actions only
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref.step(action)
        state, r = step_fn(state, jnp.asarray(action, jnp.int32))
        obs = env.observation(state)
        assert np.array_equal(np.asarray(obs["image"]), ref_obs["image"]), f"t={t}"
        assert abs(float(r) - float(ref_r)) < 1e-6
        assert bool(state.terminated) == ref_term
        assert bool(state.truncated) == ref_trunc
        if ref_term or ref_trunc:
            break


def test_inconsistent_preset_parity_including_failures():
    """Unregistered contradiction-prone presets: same seed ⇒ same level OR
    the same generation failure.  The reference's attempt loop returns after
    its first attempt regardless of attempt_limit (control.py:230-283
    returns inside the while), so a contradiction surfaces as RuntimeError
    on both sides with the RNG streams in lockstep."""
    from minigrid.envs.wfc.config import WFC_PRESETS_INCONSISTENT as REF_INC
    from minigrid.envs.wfc.wfcenv import WFCEnv as RefWFCEnv

    from minigrid_tpu.compat.parity import _np_random, generate_with_rng
    from minigrid_tpu.envs.wfc.preprocess import WFC_PRESETS_INCONSISTENT
    from minigrid_tpu.envs.wfc.wfcenv import WFCEnv

    for name, seeds in (("MazeWall", (0, 9)), ("ObstaclesHogs2", (0, 2, 6))):
        ref = RefWFCEnv(wfc_config=REF_INC[name], size=15)
        ours = WFCEnv(wfc_config=WFC_PRESETS_INCONSISTENT[name], size=15)
        for seed in seeds:
            try:
                ref.reset(seed=seed)
                ref_outcome = "ok"
            except RuntimeError:
                ref_outcome = "fail"
            try:
                state = generate_with_rng(ours, _np_random(seed), seed)
                our_outcome = "ok"
            except RuntimeError:
                our_outcome = "fail"
            assert our_outcome == ref_outcome, (name, seed)
            if ref_outcome == "ok":
                assert np.array_equal(
                    np.asarray(unpack_grid(state.grid)), ref.grid.encode()
                ), (name, seed)

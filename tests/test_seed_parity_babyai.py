"""Live seed-parity tests for BabyAI levels (see test_seed_parity.py for the
classic families).  Same contract: same seed ⇒ identical grid/pose/mission/
max_steps at reset and bit-identical obs/reward/termination along a shared
random action sequence, verified against the reference at /root/reference.
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

import jax.numpy as jnp  # noqa: E402

from minigrid_tpu.compat.parity import parity_reset  # noqa: E402
from minigrid_tpu.core.constants import unpack_grid  # noqa: E402

# One id per BabyAI mechanism family (open-room distractors, mazes, unlock
# chains, carrying variants, instruction sequencing, composite boss levels)
# for the default per-push lane; MINIGRID_TPU_FULL=1 (the scheduled
# full-sweep lane) widens to every registered variant and more seeds.
BABYAI_PARITY_IDS = [
    "BabyAI-GoToRedBall-v0",
    "BabyAI-GoToLocal-v0",
    "BabyAI-GoTo-v0",
    "BabyAI-GoToImpUnlock-v0",
    "BabyAI-GoToObjDoor-v0",
    "BabyAI-OpenDoorsOrderN4-v0",
    "BabyAI-UnblockPickup-v0",
    "BabyAI-PickupAbove-v0",
    "BabyAI-PutNextS5N2Carrying-v0",
    "BabyAI-KeyInBox-v0",
    "BabyAI-UnlockToUnlock-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-KeyCorridorS3R3-v0",
    "BabyAI-MoveTwoAcrossS8N9-v0",
    "BabyAI-GoToSeq-v0",
    "BabyAI-SynthSeq-v0",
    "BabyAI-BossLevel-v0",
]

SEEDS = [0, 41]

if os.environ.get("MINIGRID_TPU_FULL"):
    BABYAI_PARITY_IDS += [
        "BabyAI-GoToRedBallGrey-v0",
        "BabyAI-GoToRedBallNoDists-v0",
        "BabyAI-GoToObj-v0",
        "BabyAI-GoToLocalS7N5-v0",
        "BabyAI-GoToOpen-v0",
        "BabyAI-GoToRedBlueBall-v0",
        "BabyAI-GoToDoor-v0",
        "BabyAI-Open-v0",
        "BabyAI-OpenRedDoor-v0",
        "BabyAI-OpenDoor-v0",
        "BabyAI-OpenDoorLoc-v0",
        "BabyAI-OpenTwoDoors-v0",
        "BabyAI-Pickup-v0",
        "BabyAI-PickupDist-v0",
        "BabyAI-PutNextLocal-v0",
        "BabyAI-PutNextS5N2-v0",
        "BabyAI-Unlock-v0",
        "BabyAI-UnlockLocal-v0",
        "BabyAI-UnlockLocalDist-v0",
        "BabyAI-UnlockPickup-v0",
        "BabyAI-UnlockPickupDist-v0",
        "BabyAI-BlockedUnlockPickup-v0",
        "BabyAI-FindObjS5-v0",
        "BabyAI-KeyCorridorS6R3-v0",
        "BabyAI-OneRoomS8-v0",
        "BabyAI-PickupLoc-v0",
        "BabyAI-Synth-v0",
        "BabyAI-SynthLoc-v0",
        "BabyAI-MiniBossLevel-v0",
        "BabyAI-BossLevelNoUnlock-v0",
    ]
    SEEDS = [0, 3, 41]


def _ref_make(env_id):
    import gymnasium as gym
    import minigrid  # noqa: F401

    minigrid.register_minigrid_envs()
    return gym.make(env_id).unwrapped


@pytest.mark.parametrize("env_id", BABYAI_PARITY_IDS)
def test_babyai_seed_parity(env_id):
    import jax

    ref = _ref_make(env_id)
    env = None
    for seed in SEEDS:
        ref.reset(seed=seed)
        env, state = parity_reset(env if env is not None else env_id, seed)
        step_fn = jax.jit(env.step_env)

        assert np.array_equal(
            np.asarray(unpack_grid(state.grid)), ref.grid.encode()
        ), f"{env_id} seed={seed} grid"
        assert tuple(np.asarray(state.agent_pos)) == tuple(ref.agent_pos)
        assert int(state.agent_dir) == ref.agent_dir
        assert int(state.max_steps) == ref.max_steps
        assert env.mission_text(state.mission) == ref.mission

        # Reference carrying (PutNext Carrying variants lift the move object
        # post-reset; obs regenerated for comparison).
        our_obs = env.observation(state)
        assert np.array_equal(np.asarray(our_obs["image"]), ref.gen_obs()["image"])

        action_rng = np.random.default_rng(seed + 500)
        for t in range(60):
            action = int(action_rng.integers(0, 7))
            ref_obs, ref_r, ref_term, ref_trunc, _ = ref.step(action)
            state, r = step_fn(state, jnp.asarray(action, jnp.int32))
            obs = env.observation(state)
            assert np.array_equal(np.asarray(obs["image"]), ref_obs["image"]), (
                f"{env_id} seed={seed} t={t}"
            )
            assert abs(float(r) - float(ref_r)) < 1e-6, f"{env_id} s={seed} t={t}"
            assert bool(state.terminated) == ref_term, f"{env_id} s={seed} t={t}"
            assert bool(state.truncated) == ref_trunc, f"{env_id} s={seed} t={t}"
            if ref_term or ref_trunc:
                break

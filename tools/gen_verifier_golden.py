"""Generate BabyAI verifier-parity fixtures from the reference.

Runs the actual reference implementation (mounted at /root/reference) on a
sample of BabyAI levels with scripted random actions, recording the initial
grid/pose, a serialized instruction tree, the action sequence, and the
per-step (reward, terminated) outcomes.  tests/test_verifier_parity.py
replays the same grid+actions through the TPU engine's core_step +
verify_step and demands identical outcomes — the hardest parity surface
(instruction verification semantics, reference
minigrid/envs/babyai/core/verifier.py:49-566).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/reference")

ENV_IDS = [
    "BabyAI-GoToLocal-v0",
    "BabyAI-PickupLoc-v0",
    "BabyAI-OpenDoorLoc-v0",
    "BabyAI-PutNextLocalS6N4-v0",
    "BabyAI-GoToSeqS5R2-v0",
    "BabyAI-SynthSeq-v0",
    "BabyAI-ActionObjDoor-v0",
    "BabyAI-OpenDoorsOrderN4-v0",
]
EPISODES_PER_ENV = 6
STEPS = 80
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

KIND = {"GoToInstr": 1, "OpenInstr": 0, "PickupInstr": 2, "PutNextInstr": 3}
TOP = {"action": 0, "and": 1, "before": 2, "after": 3}
OBJ_TO_IDX = None
COLOR_TO_IDX = None
LOC_TO_IDX = {"left": 0, "right": 1, "front": 2, "behind": 3}


def desc_vec(desc):
    t = OBJ_TO_IDX[desc.type] if desc.type else -1
    c = COLOR_TO_IDX[desc.color] if desc.color else -1
    l = LOC_TO_IDX[desc.loc] if desc.loc else -1
    return [t, c, l]


def leaf_vec(instr):
    """(kind, strict, desc0[3], desc1[3])"""
    from minigrid.envs.babyai.core.verifier import (
        GoToInstr,
        OpenInstr,
        PickupInstr,
        PutNextInstr,
    )

    name = type(instr).__name__
    kind = KIND[name]
    strict = bool(getattr(instr, "strict", False))
    if isinstance(instr, PutNextInstr):
        d0 = desc_vec(instr.desc_move)
        d1 = desc_vec(instr.desc_fixed)
    else:
        d0 = desc_vec(instr.desc)
        d1 = [-1, -1, -1]
    return [kind, int(strict)] + d0 + d1


def serialize_instrs(instrs):
    """-> dict(top, a_is_and, b_is_and, strict, leaves int32[4, 8])."""
    from minigrid.envs.babyai.core.verifier import (
        AfterInstr,
        AndInstr,
        BeforeInstr,
    )

    leaves = np.full((4, 8), -1, np.int32)

    def fill_side(instr, base):
        if isinstance(instr, AndInstr):
            leaves[base] = leaf_vec(instr.instr_a)
            leaves[base + 1] = leaf_vec(instr.instr_b)
            return True
        leaves[base] = leaf_vec(instr)
        return False

    if isinstance(instrs, BeforeInstr):
        top = TOP["before"]
        a_and = fill_side(instrs.instr_a, 0)
        b_and = fill_side(instrs.instr_b, 2)
    elif isinstance(instrs, AfterInstr):
        top = TOP["after"]
        a_and = fill_side(instrs.instr_a, 0)
        b_and = fill_side(instrs.instr_b, 2)
    elif isinstance(instrs, AndInstr):
        top = TOP["and"]
        leaves[0] = leaf_vec(instrs.instr_a)
        leaves[1] = leaf_vec(instrs.instr_b)
        a_and = b_and = False
    else:
        top = TOP["action"]
        leaves[0] = leaf_vec(instrs)
        a_and = b_and = False
    return dict(
        top=np.int32(top),
        a_is_and=np.bool_(a_and),
        b_is_and=np.bool_(b_and),
        strict=np.bool_(False),
        leaves=leaves,
    )


def gen_fixtures(env_ids, rng, out_prefix, action_choices, done_mode=False):
    import gymnasium as gym

    for env_id in env_ids:
        env = gym.make(env_id).unwrapped
        eps = []
        seed = 0
        while len(eps) < EPISODES_PER_ENV:
            env.reset(seed=seed)
            seed += 1
            u = env
            grid = u.grid.encode()
            rec = dict(
                grid=grid.astype(np.uint8),
                pos=np.asarray(u.agent_pos, np.int32),
                dir=np.int32(u.agent_dir),
                room_size=np.int32(u.room_size) if hasattr(u, "room_size") else np.int32(0),
                num_rows=np.int32(getattr(u, "num_rows", 1)),
                num_cols=np.int32(getattr(u, "num_cols", 1)),
                max_steps=np.int32(u.max_steps),
                **serialize_instrs(u.instrs),
            )
            # Biased random actions: mostly movement, some interactions.
            actions = rng.choice(action_choices, size=STEPS).astype(np.int32)
            rewards, terms = [], []
            for a in actions:
                _, r, term, trunc, _ = u.step(int(a))
                rewards.append(np.float32(r))
                terms.append(bool(term))
                if term or trunc:
                    break
            rec["actions"] = actions[: len(rewards)]
            rec["rewards"] = np.asarray(rewards, np.float32)
            rec["terminated"] = np.asarray(terms, bool)
            eps.append(rec)

        out = {}
        for i, rec in enumerate(eps):
            for k, v in rec.items():
                out[f"ep{i}_{k}"] = v
        out["num_eps"] = np.int32(len(eps))
        out["done_mode"] = np.bool_(done_mode)
        path = os.path.join(OUT, f"{out_prefix}{env_id}.npz")
        np.savez_compressed(path, **out)
        print("wrote", path, f"({len(eps)} episodes)")


def main():
    global OBJ_TO_IDX, COLOR_TO_IDX
    import minigrid
    from minigrid.core.constants import COLOR_TO_IDX as C2I, OBJECT_TO_IDX as O2I

    OBJ_TO_IDX, COLOR_TO_IDX = O2I, C2I
    minigrid.register_minigrid_envs()

    gen_fixtures(ENV_IDS, np.random.default_rng(7), "verifier_", [0, 1, 2, 2, 2, 3, 4, 5])

    # Done-actions mode (reference verifier.py:25): the flag is a module
    # global looked up at call time, so setting it after import flips every
    # ActionInstr.verify / AndInstr.verify into the done-action branch.
    # Done actions are mixed into the policy so both the success path
    # (lastStepMatch → done) and the failure path are exercised.
    import minigrid.envs.babyai.core.verifier as ref_verifier

    ref_verifier.use_done_actions = True
    try:
        gen_fixtures(
            ENV_IDS,
            np.random.default_rng(11),
            "verifier_done_",
            [0, 1, 2, 2, 2, 3, 4, 5, 6, 2, 2, 6],
            done_mode=True,
        )
    finally:
        ref_verifier.use_done_actions = False


if __name__ == "__main__":
    main()

"""Record reference wrapper/render outputs as golden fixtures.

For a set of reference env states (random rollouts), records the exact output
of each observation wrapper and of the RGB frame renderers, keyed by the full
encoded state — our tests rebuild the state and demand bit-identical arrays.

Usage: python tools/gen_wrapper_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/reference")
os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

import numpy as np  # noqa: E402

import minigrid  # noqa: E402

minigrid.register_minigrid_envs()

import gymnasium as gym  # noqa: E402

# gymnasium >= 1.2 dropped implicit attribute forwarding that the reference
# wrappers rely on (e.g. SymbolicObsWrapper reads self.grid); restore it.
def _wrapper_getattr(self, name):
    if name.startswith("_") or name == "env":
        raise AttributeError(name)
    return getattr(object.__getattribute__(self, "env"), name)


gym.Wrapper.__getattr__ = _wrapper_getattr
from minigrid.wrappers import (  # noqa: E402
    DictObservationSpaceWrapper,
    FlatObsWrapper,
    FullyObsWrapper,
    NoDeath,
    OneHotPartialObsWrapper,
    SymbolicObsWrapper,
    ViewSizeWrapper,
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.gen_golden import encode_carrying, encode_grid  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def record_wrapper_obs(env_id: str, num_seeds: int = 2, steps: int = 60) -> dict:
    env = gym.make(env_id).unwrapped
    w_full = FullyObsWrapper(env)
    w_onehot = OneHotPartialObsWrapper(env)
    w_sym = SymbolicObsWrapper(env)
    w_dict = DictObservationSpaceWrapper(env)
    w_flat = FlatObsWrapper(env)
    w_view = ViewSizeWrapper(env, agent_view_size=5)

    rec = {k: [] for k in (
        "grid", "contains", "pos", "dir", "carry", "mission_text",
        "fully", "onehot", "symbolic", "dict_mission", "flat", "view5",
        "rgb_full", "rgb_pov",
    )}
    rng = np.random.default_rng(99)
    for seed in range(num_seeds):
        obs, _ = env.reset(seed=seed)
        for t in range(steps):
            g, cont = encode_grid(env.grid)
            rec["grid"].append(g)
            rec["contains"].append(cont)
            rec["pos"].append(np.asarray(env.agent_pos, np.int32))
            rec["dir"].append(np.int32(env.agent_dir))
            rec["carry"].append(encode_carrying(env.carrying))
            rec["mission_text"].append(env.mission)
            rec["fully"].append(w_full.observation(dict(obs))["image"])
            rec["onehot"].append(w_onehot.observation(dict(obs))["image"])
            rec["symbolic"].append(
                w_sym.observation(dict(obs))["image"].astype(np.int32)
            )
            rec["dict_mission"].append(
                np.asarray(w_dict.observation(dict(obs))["mission"], np.int32)
            )
            w_flat.cachedStr = None  # defeat the cross-call cache
            rec["flat"].append(w_flat.observation(dict(obs)))
            rec["view5"].append(w_view.observation(dict(obs))["image"])
            rec["rgb_full"].append(env.get_frame(highlight=True, tile_size=8))
            rec["rgb_pov"].append(env.get_frame(tile_size=8, agent_pov=True))
            obs, _, term, trunc, _ = env.step(int(rng.integers(0, 7)))
            if term or trunc:
                obs, _ = env.reset(seed=1000 + seed)
    out = {}
    for k, v in rec.items():
        if k == "mission_text":
            out[k] = np.asarray(v)
        else:
            out[k] = np.stack(v)
    out["see_through_walls"] = np.bool_(env.see_through_walls)
    out["agent_view_size"] = np.int32(env.agent_view_size)
    return out


def record_nodeath(env_id: str, no_death_types, num_seeds=3, steps=150) -> dict:
    env = NoDeath(
        gym.make(env_id).unwrapped, no_death_types=no_death_types, death_cost=-1.0
    )
    base = env.unwrapped
    rec = {k: [] for k in (
        "grid", "contains", "pos", "dir", "carry", "step_count", "action",
        "reward", "terminated", "truncated",
    )}
    rng = np.random.default_rng(5)
    for seed in range(num_seeds):
        base.reset(seed=seed)
        for _ in range(steps):
            g, cont = encode_grid(base.grid)
            rec["grid"].append(g)
            rec["contains"].append(cont)
            rec["pos"].append(np.asarray(base.agent_pos, np.int32))
            rec["dir"].append(np.int32(base.agent_dir))
            rec["carry"].append(encode_carrying(base.carrying))
            rec["step_count"].append(np.int32(base.step_count))
            a = int(rng.choice([0, 1, 2, 2, 2, 5]))
            rec["action"].append(np.int32(a))
            _, r, term, trunc, _ = env.step(a)
            rec["reward"].append(np.float32(r))
            rec["terminated"].append(bool(term))
            rec["truncated"].append(bool(trunc))
            if term or trunc:
                base.reset(seed=2000 + seed)
    out = {k: np.stack(v) for k, v in rec.items()}
    out["max_steps"] = np.int32(base.max_steps)
    return out


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for env_id in ["MiniGrid-DoorKey-8x8-v0", "MiniGrid-LavaCrossingS9N2-v0"]:
        data = record_wrapper_obs(env_id)
        path = os.path.join(OUT_DIR, f"wrappers_{env_id}.npz")
        np.savez_compressed(path, **data)
        print(f"wrote {path} ({data['grid'].shape[0]} states)")
    data = record_nodeath("MiniGrid-LavaCrossingS9N1-v0", ("lava",))
    path = os.path.join(OUT_DIR, "nodeath_lava.npz")
    np.savez_compressed(path, **data)
    print(f"wrote {path} ({data['grid'].shape[0]} transitions)")


if __name__ == "__main__":
    main()

"""Generate golden parity fixtures from the reference Minigrid.

Runs the actual reference implementation (mounted at /root/reference) and
records transition/observation tuples as .npz files under tests/golden/.
Our test suite replays these through the TPU engine and demands bit-exact
agreement — pinning the behavioral contracts of SURVEY.md §2c without
copying any reference code into the framework.

Usage:  python tools/gen_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/reference")
os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

import numpy as np  # noqa: E402

import minigrid  # noqa: E402,F401  (reference package)

minigrid.register_minigrid_envs()
from minigrid.core.grid import Grid  # noqa: E402
from minigrid.core.world_object import Box, WorldObj  # noqa: E402
import gymnasium as gym  # noqa: E402

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

STEP_ENVS = [
    ("MiniGrid-Empty-5x5-v0", 3, 150),
    ("MiniGrid-Empty-8x8-v0", 3, 200),
    ("MiniGrid-Empty-Random-6x6-v0", 3, 150),
    ("MiniGrid-DoorKey-5x5-v0", 4, 250),
    ("MiniGrid-DoorKey-8x8-v0", 4, 300),
    ("MiniGrid-FourRooms-v0", 2, 200),
    ("MiniGrid-DistShift1-v0", 2, 150),
    ("MiniGrid-LavaGapS7-v0", 3, 150),
    ("MiniGrid-LavaCrossingS9N2-v0", 3, 150),
    ("MiniGrid-SimpleCrossingS11N5-v0", 2, 150),
]


def _extra_fetch(env):
    from minigrid.core.constants import COLOR_TO_IDX, OBJECT_TO_IDX

    return {
        "target_type": np.int32(OBJECT_TO_IDX[env.targetType]),
        "target_color": np.int32(COLOR_TO_IDX[env.targetColor]),
    }


def _extra_target_pos(env):
    return {"target_pos": np.asarray(env.target_pos, np.int32)}


def _extra_putnear(env):
    from minigrid.core.constants import COLOR_TO_IDX, OBJECT_TO_IDX

    return {
        "move_type": np.int32(OBJECT_TO_IDX[env.move_type]),
        "move_color": np.int32(COLOR_TO_IDX[env.moveColor]),
        "target_pos": np.asarray(env.target_pos, np.int32),
    }


def _extra_memory(env):
    return {
        "success_pos": np.asarray(env.success_pos, np.int32),
        "failure_pos": np.asarray(env.failure_pos, np.int32),
    }


def _extra_redblue(env):
    grid_enc = env.grid.encode()
    doors = np.argwhere(grid_enc[..., 0] == 4)
    red = [p for p in doors if grid_enc[p[0], p[1], 1] == 0][0]
    blue = [p for p in doors if grid_enc[p[0], p[1], 1] == 2][0]
    return {
        "red_pos": np.asarray(red, np.int32),
        "blue_pos": np.asarray(blue, np.int32),
    }


# Envs whose step() overlays family-specific reward/termination logic:
# record the reference's target metadata so the test can rebuild the
# EnvState.extra pytree and replay through env.step_env.
OVERLAY_ENVS = [
    ("MiniGrid-Fetch-8x8-N3-v0", 4, 250, _extra_fetch),
    ("MiniGrid-GoToDoor-8x8-v0", 4, 200, _extra_target_pos),
    ("MiniGrid-GoToObject-8x8-N2-v0", 4, 200, _extra_target_pos),
    ("MiniGrid-PutNear-8x8-N3-v0", 6, 250, _extra_putnear),
    ("MiniGrid-MemoryS13-v0", 4, 250, _extra_memory),
    ("MiniGrid-RedBlueDoors-8x8-v0", 4, 300, _extra_redblue),
]


def encode_grid(grid: Grid) -> tuple[np.ndarray, np.ndarray]:
    """Encode a reference Grid to (cells[W,H,3], contains[W,H,2]) uint8."""
    cells = grid.encode()  # (W, H, 3)
    contains = np.zeros((grid.width, grid.height, 2), dtype=np.uint8)
    for i in range(grid.width):
        for j in range(grid.height):
            obj = grid.get(i, j)
            if isinstance(obj, Box) and obj.contains is not None:
                enc = obj.contains.encode()
                contains[i, j, 0] = enc[0]
                contains[i, j, 1] = enc[1]
    return cells, contains


def encode_carrying(obj: WorldObj | None) -> np.ndarray:
    out = np.zeros(4, dtype=np.uint8)
    if obj is not None:
        enc = obj.encode()
        out[0], out[1] = enc[0], enc[1]
        if isinstance(obj, Box) and obj.contains is not None:
            cenc = obj.contains.encode()
            out[2], out[3] = cenc[0], cenc[1]
    return out


def record_steps(
    env_id: str, num_seeds: int, steps_per_seed: int, extra_fn=None
) -> dict:
    """Play random actions, recording full pre/post state per transition."""
    rec = {k: [] for k in (
        "grid_pre", "contains_pre", "pos_pre", "dir_pre", "carry_pre",
        "step_count_pre", "action",
        "grid_post", "contains_post", "pos_post", "dir_post", "carry_post",
        "reward", "terminated", "truncated", "obs_image",
    )}
    extras: list[dict] = []
    env = gym.make(env_id).unwrapped
    rng = np.random.default_rng(12345)
    for seed in range(num_seeds):
        env.reset(seed=seed)
        for _ in range(steps_per_seed):
            if extra_fn is not None:
                extras.append(extra_fn(env))
            g_pre, c_pre = encode_grid(env.grid)
            rec["grid_pre"].append(g_pre)
            rec["contains_pre"].append(c_pre)
            rec["pos_pre"].append(np.asarray(env.agent_pos, np.int32))
            rec["dir_pre"].append(np.int32(env.agent_dir))
            rec["carry_pre"].append(encode_carrying(env.carrying))
            rec["step_count_pre"].append(np.int32(env.step_count))
            # Bias toward interactions so pickup/drop/toggle branches get hit.
            action = int(rng.choice([0, 1, 2, 2, 2, 3, 4, 5, 6]))
            rec["action"].append(np.int32(action))
            obs, reward, terminated, truncated, _ = env.step(action)
            g_post, c_post = encode_grid(env.grid)
            rec["grid_post"].append(g_post)
            rec["contains_post"].append(c_post)
            rec["pos_post"].append(np.asarray(env.agent_pos, np.int32))
            rec["dir_post"].append(np.int32(env.agent_dir))
            rec["carry_post"].append(encode_carrying(env.carrying))
            rec["reward"].append(np.float32(reward))
            rec["terminated"].append(bool(terminated))
            rec["truncated"].append(bool(truncated))
            rec["obs_image"].append(obs["image"])
            if terminated or truncated:
                env.reset(seed=1000 + seed * 1000 + env.step_count)
    out = {k: np.stack(v) for k, v in rec.items()}
    if extras:
        for ek in extras[0]:
            out["extra_" + ek] = np.stack([e[ek] for e in extras])
    out["max_steps"] = np.int32(env.max_steps)
    out["see_through_walls"] = np.bool_(env.see_through_walls)
    out["agent_view_size"] = np.int32(env.agent_view_size)
    return out


def record_vis_masks(num_cases: int = 4000, view: int = 7) -> dict:
    """Random view grids -> reference process_vis masks.

    Exercises the occlusion flood (reference: minigrid/core/grid.py:291-328)
    over a much denser input space than env rollouts reach.
    """
    rng = np.random.default_rng(7)
    grids = np.zeros((num_cases, view, view, 3), dtype=np.uint8)
    masks = np.zeros((num_cases, view, view), dtype=bool)
    # object palette: empty, wall, floor, door(3 states), key, ball, box, goal, lava
    for n in range(num_cases):
        arr = np.zeros((view, view, 3), dtype=np.uint8)
        for i in range(view):
            for j in range(view):
                t = rng.choice([1, 1, 1, 2, 2, 3, 4, 5, 6, 7, 8, 9])
                c = rng.integers(0, 6)
                s = rng.integers(0, 3) if t == 4 else 0
                arr[i, j] = (t, c, s)
        # Agent cell must be walkable (it's where the agent stands).
        arr[view // 2, view - 1] = (1, 0, 0)
        grid, _ = Grid.decode(arr)
        grids[n] = arr
        masks[n] = grid.process_vis(agent_pos=(view // 2, view - 1))
    return {"grids": grids, "masks": masks}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for env_id, seeds, steps in STEP_ENVS:
        data = record_steps(env_id, seeds, steps)
        path = os.path.join(OUT_DIR, f"steps_{env_id}.npz")
        np.savez_compressed(path, **data)
        n = data["action"].shape[0]
        print(f"wrote {path} ({n} transitions)")
    for env_id, seeds, steps, extra_fn in OVERLAY_ENVS:
        data = record_steps(env_id, seeds, steps, extra_fn)
        path = os.path.join(OUT_DIR, f"overlay_{env_id}.npz")
        np.savez_compressed(path, **data)
        n = data["action"].shape[0]
        print(f"wrote {path} ({n} transitions)")
    vis = record_vis_masks()
    path = os.path.join(OUT_DIR, "process_vis.npz")
    np.savez_compressed(path, **vis)
    print(f"wrote {path} ({vis['grids'].shape[0]} cases)")


if __name__ == "__main__":
    main()

"""Generate a corpus of reference-produced WFC levels for distributional tests.

Runs the ACTUAL reference WFC environment (/root/reference, read-only) for a
handful of registered presets and stores the inner wall bitmaps plus
agent/goal positions in tests/golden/wfc_ref_corpus.npz.  The companion test
(tests/test_wfc.py::TestReferenceDistribution) compares device-generated
levels against these statistically (wall density, 2x2 block distribution,
connectivity) — reference: minigrid/envs/wfc/wfcenv.py:154-201.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REFERENCE = "/root/reference"
sys.path.insert(0, REFERENCE)
os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

from minigrid.envs.wfc import WFCEnv  # noqa: E402

PRESETS = [
    "MazeSimple",
    "ObstaclesBlackdots",
    "RoomsFabric",
    "DungeonMazeScaled",
    "ObstaclesAngular",
    "ObstaclesHogs3",
]
N_LEVELS = 48
SIZE = 25


def main() -> None:
    out: dict[str, np.ndarray] = {}
    path = os.path.join(
        os.path.dirname(__file__), "..", "tests", "golden", "wfc_ref_corpus.npz"
    )
    if os.path.exists(path):  # incremental: keep presets already generated
        with np.load(path) as z:
            out.update({k: z[k] for k in z.files})
    from minigrid.core.constants import OBJECT_TO_IDX

    for name in PRESETS:
        if f"{name}_walls" in out:
            continue
        env = WFCEnv(wfc_config=name, size=SIZE)
        walls = np.zeros((N_LEVELS, SIZE - 2, SIZE - 2), dtype=bool)
        starts = np.zeros((N_LEVELS, 2), dtype=np.int16)
        goals = np.zeros((N_LEVELS, 2), dtype=np.int16)
        for i in range(N_LEVELS):
            env.reset(seed=1000 + i)
            u = env.unwrapped
            enc = u.grid.encode()[:, :, 0]  # [W, H] object plane
            inner = enc[1:-1, 1:-1]
            walls[i] = inner == OBJECT_TO_IDX["wall"]
            gx, gy = np.nonzero(inner == OBJECT_TO_IDX["goal"])
            goals[i] = (gx[0], gy[0])
            starts[i] = (u.agent_pos[0] - 1, u.agent_pos[1] - 1)
            print(f"{name} {i + 1}/{N_LEVELS}", flush=True)
        env.close()
        out[f"{name}_walls"] = walls
        out[f"{name}_starts"] = starts
        out[f"{name}_goals"] = goals

    np.savez_compressed(path, **out)
    print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()

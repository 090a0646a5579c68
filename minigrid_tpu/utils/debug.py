"""Host-side state inspection: deterministic state hash and pretty-printing
(reference: minigrid/minigrid_env.py:159-233)."""

from __future__ import annotations

import hashlib

import numpy as np

from minigrid_tpu.core.constants import (
    IDX_TO_COLOR,
    OBJ_DOOR,
    OBJ_EMPTY,
    STATE_LOCKED,
    STATE_OPEN,
    OBJECT_TO_IDX,
)

# Object type -> display char (reference: minigrid_env.py:186-196).
_OBJ_CHAR = {
    OBJECT_TO_IDX["wall"]: "W",
    OBJECT_TO_IDX["floor"]: "F",
    OBJECT_TO_IDX["door"]: "D",
    OBJECT_TO_IDX["key"]: "K",
    OBJECT_TO_IDX["ball"]: "A",
    OBJECT_TO_IDX["box"]: "B",
    OBJECT_TO_IDX["goal"]: "G",
    OBJECT_TO_IDX["lava"]: "V",
}
_DIR_CHAR = {0: ">", 1: "V", 2: "<", 3: "^"}


def state_hash(state, size: int = 16) -> str:
    """Hash identifying the episode state, same recipe as the reference
    (sha256 over the encoded grid + agent pose, minigrid_env.py:159-169)."""
    from minigrid_tpu.core.constants import unpack_grid

    h = hashlib.sha256()
    grid = np.asarray(unpack_grid(state.grid))
    pos = (int(state.agent_x), int(state.agent_y))
    for item in (grid.tolist(), pos, int(state.agent_dir)):
        h.update(str(item).encode("utf8"))
    return h.hexdigest()[:size]


def pprint_grid(state) -> str:
    """Two-chars-per-cell grid dump with the agent arrow
    (reference: minigrid_env.py:175-233)."""
    from minigrid_tpu.core.constants import unpack_grid

    grid = np.asarray(unpack_grid(state.grid))
    w, h = grid.shape[:2]
    pos = (int(state.agent_x), int(state.agent_y))
    direction = int(state.agent_dir)

    rows = []
    for j in range(h):
        line = ""
        for i in range(w):
            if (i, j) == pos:
                line += 2 * _DIR_CHAR[direction]
                continue
            t, c, s = (int(v) for v in grid[i, j])
            if t == OBJ_EMPTY:
                line += "  "
            elif t == OBJ_DOOR:
                if s == STATE_OPEN:
                    line += "__"
                elif s == STATE_LOCKED:
                    line += "L" + IDX_TO_COLOR[c][0].upper()
                else:
                    line += "D" + IDX_TO_COLOR[c][0].upper()
            else:
                line += _OBJ_CHAR[t] + IDX_TO_COLOR[c][0].upper()
        rows.append(line)
    return "\n".join(rows)

"""BabyAI mission encoding <-> surface text
(reference surface() methods: minigrid/envs/babyai/core/verifier.py:72-102,
:259-260, :298-299, :329-330, :377-383, :455-456, :496-497, :542-543).

The mission observation for BabyAI levels is an int32[44] vector:
  [0]  BABYAI_MARKER (-7)
  [1]  top_kind   [2] a_is_and   [3] b_is_and
  [4+10*l ...] per leaf l in 0..3:
       kind, strict, d0_type, d0_color, d0_loc, d0_plural,
       d1_type, d1_color, d1_loc, d1_plural
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core.constants import IDX_TO_COLOR, IDX_TO_OBJECT
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_GOTO,
    LEAF_OPEN,
    LEAF_PICKUP,
    LEAF_PUTNEXT,
    TOP_ACTION,
    TOP_AFTER,
    TOP_AND,
    TOP_BEFORE,
    InstrState,
)

BABYAI_MARKER = -7
MISSION_LEN = 44
LOC_NAMES = ["left", "right", "front", "behind"]


def encode_babyai_mission(instr: InstrState) -> jnp.ndarray:
    parts = [
        jnp.full((1,), BABYAI_MARKER, jnp.int32),
        instr.top_kind[None],
        instr.a_is_and.astype(jnp.int32)[None],
        instr.b_is_and.astype(jnp.int32)[None],
    ]
    for leaf in range(4):
        parts += [
            instr.leaf_kind[leaf][None],
            instr.leaf_strict[leaf].astype(jnp.int32)[None],
            instr.d_type[leaf, 0][None],
            instr.d_color[leaf, 0][None],
            instr.d_loc[leaf, 0][None],
            instr.d_plural[leaf, 0].astype(jnp.int32)[None],
            instr.d_type[leaf, 1][None],
            instr.d_color[leaf, 1][None],
            instr.d_loc[leaf, 1][None],
            instr.d_plural[leaf, 1].astype(jnp.int32)[None],
        ]
    return jnp.concatenate(parts).astype(jnp.int32)


def _desc_text(type_idx, color_idx, loc_idx, plural) -> str:
    s = IDX_TO_OBJECT[int(type_idx)] if type_idx >= 0 else "object"
    if color_idx >= 0:
        s = IDX_TO_COLOR[int(color_idx)] + " " + s
    if loc_idx >= 0:
        loc = LOC_NAMES[int(loc_idx)]
        if loc == "front":
            s += " in front of you"
        elif loc == "behind":
            s += " behind you"
        else:
            s += " on your " + loc
    return ("a " if plural else "the ") + s


def _leaf_text(m, leaf: int) -> str:
    base = 4 + 10 * leaf
    kind = int(m[base])
    d0 = _desc_text(m[base + 2], m[base + 3], m[base + 4], m[base + 5])
    if kind == LEAF_OPEN:
        return "open " + d0
    if kind == LEAF_GOTO:
        return "go to " + d0
    if kind == LEAF_PICKUP:
        return "pick up " + d0
    if kind == LEAF_PUTNEXT:
        d1 = _desc_text(m[base + 6], m[base + 7], m[base + 8], m[base + 9])
        return "put " + d0 + " next to " + d1
    return ""


def babyai_mission_text(mission) -> str:
    m = np.asarray(mission)
    assert int(m[0]) == BABYAI_MARKER
    top = int(m[1])
    a_is_and, b_is_and = bool(m[2]), bool(m[3])

    def side(leaves, is_and):
        if is_and:
            return _leaf_text(m, leaves[0]) + " and " + _leaf_text(m, leaves[1])
        return _leaf_text(m, leaves[0])

    if top == TOP_ACTION:
        return _leaf_text(m, 0)
    if top == TOP_AND:
        return _leaf_text(m, 0) + " and " + _leaf_text(m, 1)
    a = side((0, 1), a_is_and)
    b = side((2, 3), b_is_and)
    if top == TOP_BEFORE:
        return a + ", then " + b
    if top == TOP_AFTER:
        return a + " after you " + b
    return a

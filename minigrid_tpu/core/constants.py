"""Integer vocabularies and predicate lookup tables for the grid world.

Reproduces the encoding contract of the reference implementation
(reference: minigrid/core/constants.py:1-58) as dense arrays so that every
object-interaction predicate (`can_overlap`, `can_pickup`, `see_behind`;
reference: minigrid/core/world_object.py:46-64 and subclasses) becomes a
branchless table lookup usable inside `jit`/`vmap`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TILE_PIXELS = 32

# -- Object type vocabulary (reference: minigrid/core/constants.py:25-37) --
OBJ_UNSEEN = 0
OBJ_EMPTY = 1
OBJ_WALL = 2
OBJ_FLOOR = 3
OBJ_DOOR = 4
OBJ_KEY = 5
OBJ_BALL = 6
OBJ_BOX = 7
OBJ_GOAL = 8
OBJ_LAVA = 9
OBJ_AGENT = 10
NUM_OBJECTS = 11

OBJECT_TO_IDX = {
    "unseen": OBJ_UNSEEN,
    "empty": OBJ_EMPTY,
    "wall": OBJ_WALL,
    "floor": OBJ_FLOOR,
    "door": OBJ_DOOR,
    "key": OBJ_KEY,
    "ball": OBJ_BALL,
    "box": OBJ_BOX,
    "goal": OBJ_GOAL,
    "lava": OBJ_LAVA,
    "agent": OBJ_AGENT,
}
IDX_TO_OBJECT = {v: k for k, v in OBJECT_TO_IDX.items()}

# -- Color vocabulary (reference: minigrid/core/constants.py:8-22) --
COLOR_RED = 0
COLOR_GREEN = 1
COLOR_BLUE = 2
COLOR_PURPLE = 3
COLOR_YELLOW = 4
COLOR_GREY = 5
NUM_COLORS = 6

COLOR_TO_IDX = {
    "red": 0,
    "green": 1,
    "blue": 2,
    "purple": 3,
    "yellow": 4,
    "grey": 5,
}
IDX_TO_COLOR = {v: k for k, v in COLOR_TO_IDX.items()}

# Sorted color names: the reference samples colors from the *sorted* name
# list (reference: minigrid/core/constants.py:17), giving index order
# blue, green, grey, purple, red, yellow.
COLOR_NAMES = sorted(COLOR_TO_IDX.keys())
# Index permutation such that SORTED_COLOR_IDX[i] is the color index of the
# i-th sorted color name.  Used by generators that draw `_rand_color()`.
SORTED_COLOR_IDX = np.array([COLOR_TO_IDX[c] for c in COLOR_NAMES], dtype=np.int32)

COLORS_RGB = np.array(
    [
        [255, 0, 0],  # red
        [0, 255, 0],  # green
        [0, 0, 255],  # blue
        [112, 39, 195],  # purple
        [255, 255, 0],  # yellow
        [100, 100, 100],  # grey
    ],
    dtype=np.uint8,
)

# -- Door states (reference: minigrid/core/constants.py:42-46) --
STATE_OPEN = 0
STATE_CLOSED = 1
STATE_LOCKED = 2

STATE_TO_IDX = {"open": 0, "closed": 1, "locked": 2}

# -- Directions (reference: minigrid/core/constants.py:49-58) --
# 0: east (+x), 1: south (+y), 2: west (-x), 3: north (-y)
DIR_TO_VEC = jnp.array([[1, 0], [0, 1], [-1, 0], [0, -1]], dtype=jnp.int32)

# -- Predicate tables over object type --------------------------------------
# can_overlap is True for empty, floor, goal, lava unconditionally and for
# doors iff state == open (reference: minigrid/core/world_object.py:114,
# :129, :143 (Lava), :178-180 (Door)).  The unseen/agent rows never appear in
# a world grid.
_CAN_OVERLAP_BASE = np.zeros(NUM_OBJECTS, dtype=bool)
_CAN_OVERLAP_BASE[[OBJ_EMPTY, OBJ_FLOOR, OBJ_GOAL, OBJ_LAVA]] = True
CAN_OVERLAP_BASE = jnp.asarray(_CAN_OVERLAP_BASE)

# can_pickup: key, ball, box (reference: minigrid/core/world_object.py:244,
# :266, :278).
_CAN_PICKUP = np.zeros(NUM_OBJECTS, dtype=bool)
_CAN_PICKUP[[OBJ_KEY, OBJ_BALL, OBJ_BOX]] = True
CAN_PICKUP = jnp.asarray(_CAN_PICKUP)

# see_behind is False for walls and for doors that are not open
# (reference: minigrid/core/world_object.py:165-166, :182-183).
_OPAQUE_BASE = np.zeros(NUM_OBJECTS, dtype=bool)
_OPAQUE_BASE[OBJ_WALL] = True
OPAQUE_BASE = jnp.asarray(_OPAQUE_BASE)


def can_overlap(obj_type: jnp.ndarray, obj_state: jnp.ndarray) -> jnp.ndarray:
    """Whether the agent may step onto a cell holding (obj_type, obj_state)."""
    base = CAN_OVERLAP_BASE[obj_type]
    open_door = (obj_type == OBJ_DOOR) & (obj_state == STATE_OPEN)
    return base | open_door


def see_behind(obj_type: jnp.ndarray, obj_state: jnp.ndarray) -> jnp.ndarray:
    """Whether light passes through a cell holding (obj_type, obj_state)."""
    opaque = OPAQUE_BASE[obj_type] | (
        (obj_type == OBJ_DOOR) & (obj_state != STATE_OPEN)
    )
    return ~opaque


# -- Packed cell representation ----------------------------------------------
# A grid cell is ONE int32: type | color << 8 | state << 16.  The uint8
# (type, color, state) triple of the reference's ``Grid.encode``
# (minigrid/core/grid.py:244-268) remains the *encoding* at API boundaries
# (observations, golden fixtures, renderer); internally everything is packed
# so that grid arrays are [W, H] int32 — under vmap a flat, fully
# lane-utilized [N, W*H] tensor with no layout-hostile size-3 minor dim.


def cell(obj_type, color=0, state=0) -> jnp.ndarray:
    """Pack (type, color, state) into one int32 (traced values allowed)."""
    return (
        jnp.asarray(obj_type, jnp.int32)
        | (jnp.asarray(color, jnp.int32) << 8)
        | (jnp.asarray(state, jnp.int32) << 16)
    )


def cell_type(packed) -> jnp.ndarray:
    return packed & 0xFF


def cell_color(packed) -> jnp.ndarray:
    return (packed >> 8) & 0xFF


def cell_state(packed) -> jnp.ndarray:
    return (packed >> 16) & 0xFF


def with_state(packed, state) -> jnp.ndarray:
    """Replace the state byte of a packed cell."""
    return (packed & 0xFFFF) | (jnp.asarray(state, jnp.int32) << 16)


def with_color(packed, color) -> jnp.ndarray:
    """Replace the color byte of a packed cell."""
    return (packed & ~0xFF00) | (jnp.asarray(color, jnp.int32) << 8)


def pack_grid(encoded: jnp.ndarray) -> jnp.ndarray:
    """uint8[..., W, H, 3] reference encoding -> packed int32[..., W, H]."""
    e = jnp.asarray(encoded, jnp.int32)
    return e[..., 0] | (e[..., 1] << 8) | (e[..., 2] << 16)


def unpack_grid(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed int32[..., W, H] -> reference uint8[..., W, H, 3] encoding."""
    return jnp.stack(
        [cell_type(packed), cell_color(packed), cell_state(packed)], axis=-1
    ).astype(jnp.uint8)


# Packed carried-object word: type | color << 8 | hidden-contents type << 16
# | hidden-contents color << 24 (replaces the reference's ``carrying``
# object pointer + Box.contains, minigrid/core/world_object.py:274).
def pack_carry(t, c=0, ct=0, cc=0) -> jnp.ndarray:
    return (
        jnp.asarray(t, jnp.int32)
        | (jnp.asarray(c, jnp.int32) << 8)
        | (jnp.asarray(ct, jnp.int32) << 16)
        | (jnp.asarray(cc, jnp.int32) << 24)
    )


def carry_type(carry) -> jnp.ndarray:
    return carry & 0xFF


def carry_color(carry) -> jnp.ndarray:
    return (carry >> 8) & 0xFF


def carry_contents(carry) -> jnp.ndarray:
    """Hidden (type | color << 8) word of the carried box's contents."""
    return (carry >> 16) & 0xFFFF


# Packed cell constants.
EMPTY_CELL = cell(OBJ_EMPTY)
WALL_CELL = cell(OBJ_WALL, COLOR_GREY)
UNSEEN_CELL = cell(OBJ_UNSEEN)
GOAL_CELL = cell(OBJ_GOAL, COLOR_GREEN)
LAVA_CELL = cell(OBJ_LAVA, COLOR_RED)
FLOOR_CELL = cell(OBJ_FLOOR, COLOR_BLUE)

"""BabyAI GoTo levels (reference: minigrid/envs/babyai/goto.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    COLOR_BLUE,
    COLOR_GREY,
    COLOR_RED,
    OBJ_BALL,
    OBJ_DOOR,
    OBJ_KEY,
    with_color,
)
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_GOTO,
    TOP_ACTION,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel


def _single_goto(builder, s, grid_done, d_type, d_color=-1):
    """Build a single GoToInstr(ObjDesc(type, color)) instruction state."""
    instr = empty_instr(builder.width, builder.height)
    instr = set_top(instr, TOP_ACTION)
    instr = set_leaf(instr, 0, LEAF_GOTO)
    instr = set_desc(
        instr, 0, 0, grid_done, s.agent_pos, s.agent_dir, d_type, d_color
    )
    return instr


class GoToRedBallGrey(RoomGridLevel):
    """Go to the red ball; all distractors are grey
    (reference goto.py:62-77)."""

    pool_factor = 1.3  # attempt validity ~0.85 (>40-sigma headroom at 2^15 pools)

    def __init__(self, room_size: int = 8, num_dists: int = 7, **kwargs):
        self.num_dists = num_dists
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 4)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, _, _, _ = b.add_object(keys[2], s, 0, 0, kind=OBJ_BALL, color=COLOR_RED)
        s, _, _, positions = b.add_distractors(
            keys[3], s, num_distractors=self.num_dists, all_unique=False
        )
        # Recolor the distractors grey (reference :71-72).
        grid = s.grid
        w, h = grid.shape[:2]
        for n in range(self.num_dists):
            m = g.cell_mask(w, h, positions[n, 0], positions[n, 1])
            grid = jnp.where(m, with_color(grid, COLOR_GREY), grid)
        s = s.replace(grid=grid)
        valid = self.check_objs_reachable(s)
        instr = _single_goto(b, s, s.grid, OBJ_BALL, COLOR_RED)
        return s, instr, valid


class GoToRedBall(RoomGridLevel):
    """Go to the red ball among colored distractors (reference goto.py:128-140)."""

    pool_factor = 1.3  # attempt validity ~0.85 (>40-sigma headroom at 2^15 pools)

    def __init__(self, room_size: int = 8, num_dists: int = 7, **kwargs):
        self.num_dists = num_dists
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 4)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, _, _, _ = b.add_object(keys[2], s, 0, 0, kind=OBJ_BALL, color=COLOR_RED)
        s, _, _, _ = b.add_distractors(
            keys[3], s, num_distractors=self.num_dists, all_unique=False
        )
        valid = self.check_objs_reachable(s)
        instr = _single_goto(b, s, s.grid, OBJ_BALL, COLOR_RED)
        return s, instr, valid


class GoToRedBallNoDists(GoToRedBall):
    """(reference goto.py:143-192)"""

    def __init__(self, **kwargs):
        super().__init__(room_size=8, num_dists=0, **kwargs)


class GoToObj(RoomGridLevel):
    """Go to the single object in the room (reference goto.py:195-259)."""

    def __init__(self, room_size: int = 8, **kwargs):
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 3)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, kinds, colors, _ = b.add_distractors(keys[2], s, num_distractors=1)
        instr = _single_goto(b, s, s.grid, kinds[0], colors[0])
        return s, instr, jnp.asarray(True)


class GoToLocal(RoomGridLevel):
    """Go to a named object in a single room (reference goto.py:262-337)."""

    pool_factor = 1.3  # attempt validity ~0.84 (>40-sigma headroom at 2^15 pools)

    def __init__(self, room_size: int = 8, num_dists: int = 8, **kwargs):
        self.num_dists = num_dists
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 4)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, kinds, colors, _ = b.add_distractors(
            keys[2], s, num_distractors=self.num_dists, all_unique=False
        )
        valid = self.check_objs_reachable(s)
        pick = randint(keys[3], 0, self.num_dists)
        instr = _single_goto(b, s, s.grid, kinds[pick], colors[pick])
        return s, instr, valid


class GoTo(RoomGridLevel):
    """Go to a named object in a 3x3 maze (reference goto.py:340-426)."""

    def __init__(
        self,
        room_size: int = 8,
        num_rows: int = 3,
        num_cols: int = 3,
        num_dists: int = 18,
        doors_open: bool = False,
        **kwargs,
    ):
        self.num_dists = num_dists
        self.doors_open = doors_open
        super().__init__(
            room_size=room_size, num_rows=num_rows, num_cols=num_cols, **kwargs
        )

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s)
        s = b.connect_all(keys[2], s)
        s, kinds, colors, _ = b.add_distractors(
            keys[3], s, num_distractors=self.num_dists, all_unique=False
        )
        valid = self.check_objs_reachable(s)
        pick = randint(keys[4], 0, self.num_dists)
        instr = _single_goto(b, s, s.grid, kinds[pick], colors[pick])
        if self.doors_open:
            s = b.open_all_doors(s)
            # Descriptors were resolved pre-open; doors only change state,
            # not identity, so masks are unaffected.
        return s, instr, valid


class GoToImpUnlock(RoomGridLevel):
    """Go to an object possibly behind a locked door; unlocking is implicit
    (reference goto.py:428-524)."""

    def gen_attempt(self, key):
        b = self.builder
        r, c = b.num_rows, b.num_cols
        keys = jax.random.split(key, 10 + r * c)
        s = b.init(keys[0])
        id_ = randint(keys[1], 0, c)
        jd = randint(keys[2], 0, r)
        s, door_color, _ = b.add_door(keys[3], s, id_, jd, None, locked=True)

        # Key in a different room (reference :489-496; rejection == uniform
        # over the other rooms).
        off = randint(keys[4], 1, r * c)
        flat = (jd * c + id_ + off) % (r * c)
        ik, jk = flat % c, flat // c
        s, _, _, _ = b.add_object(keys[5], s, ik, jk, kind=OBJ_KEY, color=door_color)

        s = b.connect_all(keys[6], s)

        # Two distractors per non-locked room (:503-508).
        ki = 7
        for i in range(c):
            for j in range(r):
                k_two = jax.random.split(keys[ki], 2)
                ki += 1
                is_locked_room = (jnp.asarray(i) == id_) & (jnp.asarray(j) == jd)
                before = s
                s, _, _, _ = b.add_object(k_two[0], s, i, j)
                s, _, _, _ = b.add_object(k_two[1], s, i, j)
                s = jax.tree.map(
                    lambda a, bb: jnp.where(
                        jnp.reshape(is_locked_room, (1,) * a.ndim) if a.ndim else is_locked_room,
                        bb, a,
                    ),
                    s, before,
                )

        # Agent anywhere but the locked room (:511-518).
        roff = randint(keys[ki], 1, r * c)
        aflat = (jd * c + id_ + roff) % (r * c)
        s = b.place_agent(keys[ki + 1], s, aflat % c, aflat // c)
        valid = self.check_objs_reachable(s)

        # Single object in the locked room is the target (:522-524).
        s, kind, color, _ = b.add_object(keys[ki + 2], s, id_, jd)
        instr = _single_goto(b, s, s.grid, kind, color)
        return s, instr, valid


class GoToRedBlueBall(RoomGridLevel):
    """Go to the red or blue ball, unique in the room (reference goto.py:603-676)."""

    def __init__(self, room_size: int = 8, num_dists: int = 7, **kwargs):
        self.num_dists = num_dists
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, kinds, colors, _ = b.add_distractors(
            keys[2], s, num_distractors=self.num_dists, all_unique=False
        )
        # No red or blue ball distractor (reference :666-668).
        bad = (
            (kinds == OBJ_BALL) & ((colors == COLOR_RED) | (colors == COLOR_BLUE))
        ).any()
        color = jnp.where(randint(keys[3], 0, 2) == 0, COLOR_RED, COLOR_BLUE)
        s, _, _, _ = b.add_object(keys[4], s, 0, 0, kind=OBJ_BALL, color=color)
        valid = ~bad & self.check_objs_reachable(s)
        instr = _single_goto(b, s, s.grid, OBJ_BALL, color)
        return s, instr, valid


class GoToDoor(RoomGridLevel):
    """Go to a door in the center room (reference goto.py:679-760)."""

    def __init__(self, **kwargs):
        super().__init__(room_size=7, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 7)
        s = b.init(keys[0])
        colors = []
        for n in range(4):
            s, color, _ = b.add_door(keys[1 + n], s, 1, 1)
            colors.append(color)
        s = b.place_agent(keys[5], s, 1, 1)
        pick = randint(keys[6], 0, 4)
        target_color = jnp.stack(colors)[pick]
        instr = _single_goto(b, s, s.grid, OBJ_DOOR, target_color)
        return s, instr, jnp.asarray(True)


class GoToObjDoor(RoomGridLevel):
    """Go to an object or door in the center room (reference goto.py:762-814)."""

    def __init__(self, **kwargs):
        super().__init__(room_size=8, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 9)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 1, 1)
        s, kinds, colors, _ = b.add_distractors(
            keys[2], s, i=1, j=1, num_distractors=8, all_unique=False
        )
        door_colors = []
        for n in range(4):
            s, color, _ = b.add_door(keys[3 + n], s, 1, 1)
            door_colors.append(color)
        valid = self.check_objs_reachable(s)
        pick = randint(keys[7], 0, 12)
        all_kinds = jnp.concatenate(
            [kinds, jnp.full((4,), OBJ_DOOR, kinds.dtype)]
        )
        all_colors = jnp.concatenate([colors, jnp.stack(door_colors)])
        instr = _single_goto(b, s, s.grid, all_kinds[pick], all_colors[pick])
        return s, instr, valid

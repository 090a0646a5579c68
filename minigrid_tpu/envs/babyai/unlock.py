"""BabyAI Unlock levels (reference: minigrid/envs/babyai/unlock.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_KEY,
    SORTED_COLOR_IDX,
    cell,
    cell_color,
    cell_state,
    cell_type,
)
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_OPEN,
    LEAF_PICKUP,
    TOP_ACTION,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel


def _single(builder, s, leaf_kind, d_type, d_color=-1):
    instr = empty_instr(builder.width, builder.height)
    instr = set_top(instr, TOP_ACTION)
    instr = set_leaf(instr, 0, leaf_kind)
    instr = set_desc(
        instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, d_type, d_color,
        agent_room_mask=builder.agent_room_mask(s),
    )
    return instr


class Unlock(RoomGridLevel):
    """Unlock a door in a 3x3 maze (reference unlock.py:13-111)."""

    unblocking = True

    def gen_attempt(self, key):
        b = self.builder
        r, c = b.num_rows, b.num_cols
        keys = jax.random.split(key, 10 + r * c)
        s = b.init(keys[0])
        id_ = randint(keys[1], 0, c)
        jd = randint(keys[2], 0, r)
        s, door_color, _ = b.add_door(keys[3], s, id_, jd, None, locked=True)

        off = randint(keys[4], 1, r * c)
        flat = (jd * c + id_ + off) % (r * c)
        s, _, _, _ = b.add_object(keys[5], s, flat % c, flat // c, kind=OBJ_KEY, color=door_color)

        # 50%: the locked door is the only door of its color — connect_all
        # draws door colors from the palette minus door_color (reference :83-88).
        only_color = randint(keys[6], 0, 2) == 0
        exclude = jnp.where(only_color, door_color.astype(jnp.int32), -1)
        s = b.connect_all(keys[7], s, exclude_color=exclude)

        ki = 8
        for i in range(c):
            for j in range(r):
                k3 = jax.random.split(keys[ki], 3)
                ki += 1
                locked_room = (jnp.asarray(i) == id_) & (jnp.asarray(j) == jd)
                before = s
                for t in range(3):
                    s, _, _, _ = b.add_object(k3[t], s, i, j)
                s = jax.tree.map(
                    lambda a, bb: jnp.where(
                        jnp.reshape(locked_room, (1,) * a.ndim) if a.ndim else locked_room,
                        bb, a,
                    ),
                    s, before,
                )

        roff = randint(jax.random.fold_in(key, 101), 1, r * c)
        aflat = (jd * c + id_ + roff) % (r * c)
        s = b.place_agent(jax.random.fold_in(key, 102), s, aflat % c, aflat // c)
        valid = self.check_objs_reachable(s)

        instr = _single(b, s, LEAF_OPEN, OBJ_DOOR, door_color)
        return s, instr, valid


class UnlockLocal(RoomGridLevel):
    """Unlock a door in the current room (reference unlock.py:113-175)."""

    def __init__(self, distractors: bool = False, **kwargs):
        self.distractors = distractors
        super().__init__(**kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s, door_color, _ = b.add_door(keys[1], s, 1, 1, None, locked=True)
        s, _, _, _ = b.add_object(keys[2], s, 1, 1, kind=OBJ_KEY, color=door_color)
        if self.distractors:
            s, _, _, _ = b.add_distractors(keys[3], s, i=1, j=1, num_distractors=3)
        s = b.place_agent(keys[4], s, 1, 1)
        instr = _single(b, s, LEAF_OPEN, OBJ_DOOR)
        return s, instr, jnp.asarray(True)


class KeyInBox(RoomGridLevel):
    """Unlock a door; the key is hidden in a box (reference unlock.py:177-241)."""

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s, door_color, _ = b.add_door(keys[1], s, 1, 1, None, locked=True)
        box_color = jnp.asarray(SORTED_COLOR_IDX)[randint(keys[2], 0, 6)]
        box_cell = cell(jnp.asarray(OBJ_BOX, jnp.int32), box_color)
        s, pos = b.place_in_room(keys[3], s, 1, 1, box_cell)
        s = b.place_agent(keys[4], s, 1, 1)
        instr = _single(b, s, LEAF_OPEN, OBJ_DOOR)
        self._pending_box = (pos, door_color)
        return s, instr, jnp.asarray(True)

    def _generate(self, key):
        state = super()._generate(key)
        # The box hides the door key; rebuild contains from the grid (the
        # single box cell) since gen_attempt runs inside a while_loop.
        is_box = cell_type(state.grid) == OBJ_BOX
        # Door color: the unique locked door in the grid.
        is_locked = (cell_type(state.grid) == OBJ_DOOR) & (cell_state(state.grid) == 2)
        door_color = (
            jnp.where(is_locked, cell_color(state.grid), 0).astype(jnp.int32).sum()
        )
        contains = jnp.where(
            is_box,
            jnp.asarray(OBJ_KEY, jnp.int32) | (door_color << 8),
            state.contains,
        )
        return state.replace(contains=contains)


class UnlockPickup(RoomGridLevel):
    """Unlock a door, then pick up a box in the other room
    (reference unlock.py:244-319)."""

    def __init__(self, distractors: bool = False, max_steps: int | None = None, **kwargs):
        self.distractors = distractors
        # The reference's `if max is None:` tests the BUILTIN max, so its
        # 8*room_size**2 default is dead code and max_steps stays dynamic
        # (reference unlock.py:301-309) — mirrored for parity.
        super().__init__(num_rows=1, num_cols=2, room_size=6, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 6)
        s = b.init(keys[0])
        s, _, box_color, _ = b.add_object(keys[1], s, 1, 0, kind=OBJ_BOX)
        s, door_color, _ = b.add_door(keys[2], s, 0, 0, 0, locked=True)
        s, _, _, _ = b.add_object(keys[3], s, 0, 0, kind=OBJ_KEY, color=door_color)
        if self.distractors:
            s, _, _, _ = b.add_distractors(keys[4], s, num_distractors=4)
        s = b.place_agent(keys[5], s, 0, 0)
        instr = _single(b, s, LEAF_PICKUP, OBJ_BOX, box_color)
        return s, instr, jnp.asarray(True)


class BlockedUnlockPickup(RoomGridLevel):
    """As UnlockPickup but the door is blocked by a ball
    (reference unlock.py:321-393)."""

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 16 * room_size**2
        super().__init__(num_rows=1, num_cols=2, room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 6)
        s = b.init(keys[0])
        s, _, _, _ = b.add_object(keys[1], s, 1, 0, kind=OBJ_BOX)
        s, door_color, pos = b.add_door(keys[2], s, 0, 0, 0, locked=True)
        ball_color = jnp.asarray(SORTED_COLOR_IDX)[randint(keys[3], 0, 6)]
        s = s.replace(
            grid=g.set_cell(
                s.grid, pos[0] - 1, pos[1],
                cell(jnp.asarray(OBJ_BALL, jnp.int32), ball_color),
            )
        )
        s, _, _, _ = b.add_object(keys[4], s, 0, 0, kind=OBJ_KEY, color=door_color)
        s = b.place_agent(keys[5], s, 0, 0)
        instr = _single(b, s, LEAF_PICKUP, OBJ_BOX)
        return s, instr, jnp.asarray(True)


class UnlockToUnlock(RoomGridLevel):
    """Two chained locked doors (reference unlock.py:395-471)."""

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(num_rows=1, num_cols=3, room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 8)
        s = b.init(keys[0])
        colors = jnp.asarray(SORTED_COLOR_IDX)[jax.random.permutation(keys[1], 6)[:2]]
        s, _, _ = b.add_door(keys[2], s, 0, 0, 0, color=colors[0], locked=True)
        s, _, _, _ = b.add_object(keys[3], s, 2, 0, kind=OBJ_KEY, color=colors[0])
        s, _, _ = b.add_door(keys[4], s, 1, 0, 0, color=colors[1], locked=True)
        s, _, _, _ = b.add_object(keys[5], s, 1, 0, kind=OBJ_KEY, color=colors[1])
        s, _, _, _ = b.add_object(keys[6], s, 0, 0, kind=OBJ_BALL)
        s = b.place_agent(keys[7], s, 1, 0)
        instr = _single(b, s, LEAF_PICKUP, OBJ_BALL)
        return s, instr, jnp.asarray(True)

"""BabyAI 'other' levels (reference: minigrid/envs/babyai/other.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.constants import OBJ_DOOR, OBJ_KEY
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_GOTO,
    LEAF_OPEN,
    LEAF_PICKUP,
    LEAF_PUTNEXT,
    TOP_ACTION,
    TOP_BEFORE,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel


class ActionObjDoor(RoomGridLevel):
    """[pick up / go to / open] an object or door in the current room
    (reference other.py:18-105)."""

    def __init__(self, **kwargs):
        super().__init__(room_size=7, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 9)
        s = b.init(keys[0])
        s, kinds, colors, _ = b.add_distractors(keys[1], s, i=1, j=1, num_distractors=5)
        door_colors = []
        for n in range(4):
            s, color, _ = b.add_door(keys[2 + n], s, 1, 1, locked=False)
            door_colors.append(color)
        s = b.place_agent(keys[6], s, 1, 1)

        pick = randint(keys[7], 0, 9)
        all_kinds = jnp.concatenate([kinds, jnp.full((4,), OBJ_DOOR, kinds.dtype)])
        all_colors = jnp.concatenate([colors, jnp.stack(door_colors)])
        t = all_kinds[pick].astype(jnp.int32)
        c = all_colors[pick].astype(jnp.int32)
        coin = randint(keys[8], 0, 2) == 0
        # door: goto/open; object: goto/pickup (reference :96-105).
        leaf = jnp.where(
            coin, LEAF_GOTO, jnp.where(t == OBJ_DOOR, LEAF_OPEN, LEAF_PICKUP)
        )
        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, TOP_ACTION)
        instr = set_leaf(instr, 0, leaf)
        instr = set_desc(
            instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, t, c,
            agent_room_mask=b.agent_room_mask(s),
        )
        return s, instr, jnp.asarray(True)


class FindObjS5(RoomGridLevel):
    """Pick up an object described only by type, hidden in any room
    (reference other.py:108-177)."""

    def __init__(self, room_size: int = 5, max_steps: int | None = None, **kwargs):
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 6)
        s = b.init(keys[0])
        # NOTE the reference swaps rows/cols here (i=rand(num_rows),
        # j=rand(num_cols), other.py:170-171) — 3x3, so equivalent.
        i = randint(keys[1], 0, b.num_cols)
        j = randint(keys[2], 0, b.num_rows)
        s, kind, _, _ = b.add_object(keys[3], s, i, j)
        s = b.place_agent(keys[4], s, 1, 1)
        s = b.connect_all(keys[5], s)
        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, TOP_ACTION)
        instr = set_leaf(instr, 0, LEAF_PICKUP)
        instr = set_desc(
            instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, kind,
            agent_room_mask=b.agent_room_mask(s),
        )
        return s, instr, jnp.asarray(True)


class KeyCorridor(RoomGridLevel):
    """Key-corridor maze with a type-only pickup instruction
    (reference other.py:179-272)."""

    def __init__(
        self,
        num_rows: int = 3,
        obj_type: str = "ball",
        room_size: int = 6,
        max_steps: int | None = None,
        **kwargs,
    ):
        from minigrid_tpu.core.constants import OBJECT_TO_IDX

        self.obj_kind = OBJECT_TO_IDX[obj_type]
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(
            room_size=room_size, num_rows=num_rows, num_cols=3, max_steps=max_steps, **kwargs
        )

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 8)
        s = b.init(keys[0])
        for j in range(1, b.num_rows):
            s = b.remove_wall(s, 1, j, 3)
        room_idx = randint(keys[1], 0, b.num_rows)
        s, door_color, _ = b.add_door(keys[2], s, 2, room_idx, 2, locked=True)
        s, kind, _, _ = b.add_object(keys[3], s, 2, room_idx, kind=self.obj_kind)
        s, _, _, _ = b.add_object(
            keys[4], s, 0, randint(keys[5], 0, b.num_rows), kind=OBJ_KEY, color=door_color
        )
        s = b.place_agent(keys[6], s, 1, b.num_rows // 2)
        s = b.connect_all(keys[7], s)
        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, TOP_ACTION)
        instr = set_leaf(instr, 0, LEAF_PICKUP)
        instr = set_desc(
            instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, kind,
            agent_room_mask=b.agent_room_mask(s),
        )
        return s, instr, jnp.asarray(True)


class OneRoomS8(RoomGridLevel):
    """Pick up the ball in a single room (reference other.py:274-332)."""

    def __init__(self, room_size: int = 8, **kwargs):
        super().__init__(room_size=room_size, num_rows=1, num_cols=1, **kwargs)

    def gen_attempt(self, key):
        from minigrid_tpu.core.constants import OBJ_BALL

        b = self.builder
        keys = jax.random.split(key, 3)
        s = b.init(keys[0])
        s, kind, _, _ = b.add_object(keys[1], s, 0, 0, kind=OBJ_BALL)
        s = b.place_agent(keys[2], s)
        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, TOP_ACTION)
        instr = set_leaf(instr, 0, LEAF_PICKUP)
        instr = set_desc(
            instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, kind,
            agent_room_mask=b.agent_room_mask(s),
        )
        return s, instr, jnp.asarray(True)


class MoveTwoAcross(RoomGridLevel):
    """Two ordered PutNext tasks across two rooms (reference other.py:334-425)."""

    def __init__(self, room_size: int, objs_per_room: int, max_steps: int | None = None, **kwargs):
        assert objs_per_room <= 9
        self.objs_per_room = objs_per_room
        if max_steps is None:
            max_steps = 16 * room_size**2
        super().__init__(
            num_rows=1, num_cols=2, room_size=room_size, max_steps=max_steps, **kwargs
        )

    def gen_attempt(self, key):
        b = self.builder
        n = self.objs_per_room
        keys = jax.random.split(key, 9)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, kl, cl, _ = b.add_distractors(keys[2], s, i=0, j=0, num_distractors=n)
        s, kr, cr, _ = b.add_distractors(keys[3], s, i=1, j=0, num_distractors=n)
        s = b.remove_wall(s, 0, 0, 0)

        # Two distinct picks per room (reference :414-419).
        la = randint(keys[4], 0, n)
        lb = (la + randint(keys[5], 1, n)) % n if n > 1 else la
        ra = randint(keys[6], 0, n)
        rb = (ra + randint(keys[7], 1, n)) % n if n > 1 else ra

        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, TOP_BEFORE)
        instr = set_leaf(instr, 0, LEAF_PUTNEXT)
        instr = set_leaf(instr, 2, LEAF_PUTNEXT)
        room = b.agent_room_mask(s)
        args = (s.grid, s.agent_pos, s.agent_dir)
        instr = set_desc(instr, 0, 0, *args, kl[la], cl[la], agent_room_mask=room)
        instr = set_desc(instr, 0, 1, *args, kr[ra], cr[ra], agent_room_mask=room)
        instr = set_desc(instr, 2, 0, *args, kr[rb], cr[rb], agent_room_mask=room)
        instr = set_desc(instr, 2, 1, *args, kl[lb], cl[lb], agent_room_mask=room)
        return s, instr, jnp.asarray(True)

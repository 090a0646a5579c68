"""BabyAI Open levels (reference: minigrid/envs/babyai/open.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.constants import COLOR_RED, OBJ_DOOR, SORTED_COLOR_IDX, cell_color, cell_type
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_OPEN,
    TOP_ACTION,
    TOP_AFTER,
    TOP_BEFORE,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel

_LOC_COUNT = 4


def _open_instr(builder, s, d_type=OBJ_DOOR, d_color=-1, d_loc=-1, strict=False):
    instr = empty_instr(builder.width, builder.height)
    instr = set_top(instr, TOP_ACTION)
    instr = set_leaf(instr, 0, LEAF_OPEN, strict=strict)
    room = builder.agent_room_mask(s)
    instr = set_desc(
        instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, d_type, d_color, d_loc,
        agent_room_mask=room,
    )
    return instr


class Open(RoomGridLevel):
    """Open a door in a 3x3 maze (reference open.py:18-86)."""

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s)
        s = b.connect_all(keys[2], s)
        s, _, _, _ = b.add_distractors(keys[3], s, num_distractors=18, all_unique=False)
        valid = self.check_objs_reachable(s)
        # Pick a uniform random door cell (reference :74-85 collects door
        # objects room-by-room and samples; each door is one grid cell, but
        # shared doors appear twice in the reference list — sampling a door
        # CELL weights each physical door once; the reference double-counts
        # doors shared between rooms uniformly, which is the same marginal
        # over physical doors since every interior door is shared exactly
        # twice).
        is_door = cell_type(s.grid) == OBJ_DOOR
        from minigrid_tpu.core.sampling import sample_mask_cell

        pos = sample_mask_cell(keys[4], is_door)
        color = cell_color(s.grid[pos[0], pos[1]])
        instr = _open_instr(b, s, OBJ_DOOR, color)
        return s, instr, valid


class OpenRedDoor(RoomGridLevel):
    """Open the red door in a 2-room setup (reference open.py:88-146)."""

    def __init__(self, **kwargs):
        super().__init__(num_rows=1, num_cols=2, room_size=5, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 3)
        s = b.init(keys[0])
        s, _, _ = b.add_door(keys[1], s, 0, 0, 0, color=COLOR_RED, locked=False)
        s = b.place_agent(keys[2], s, 0, 0)
        instr = _open_instr(b, s, OBJ_DOOR, COLOR_RED)
        return s, instr, jnp.asarray(True)


class OpenDoor(RoomGridLevel):
    """Open a door selected by color or location (reference open.py:148-228)."""

    def __init__(self, debug: bool = False, select_by: str | None = None, **kwargs):
        self.select_by = select_by
        self.debug = debug
        super().__init__(**kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 9)
        s = b.init(keys[0])
        colors = jnp.asarray(SORTED_COLOR_IDX)[jax.random.permutation(keys[1], 6)[:4]]
        for i in range(4):
            s, _, _ = b.add_door(keys[2 + i], s, 1, 1, i, color=colors[i], locked=False)

        if self.select_by is None:
            by_color = randint(keys[6], 0, 2) == 0
        else:
            by_color = jnp.asarray(self.select_by == "color")
        loc = randint(keys[7], 0, _LOC_COUNT)
        d_color = jnp.where(by_color, colors[0].astype(jnp.int32), -1)
        d_loc = jnp.where(by_color, -1, loc)

        s = b.place_agent(keys[8], s, 1, 1)
        instr = _open_instr(b, s, OBJ_DOOR, d_color, d_loc, strict=self.debug)
        return s, instr, jnp.asarray(True)


class OpenTwoDoors(RoomGridLevel):
    """Open door A then door B (reference open.py:231-323)."""

    def __init__(
        self,
        first_color: str | None = None,
        second_color: str | None = None,
        strict: bool = False,
        max_steps: int | None = None,
        **kwargs,
    ):
        from minigrid_tpu.core.constants import COLOR_TO_IDX

        self.first_color = COLOR_TO_IDX[first_color] if first_color else None
        self.second_color = COLOR_TO_IDX[second_color] if second_color else None
        self.strict = strict
        room_size = 6
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        colors = jnp.asarray(SORTED_COLOR_IDX)[jax.random.permutation(keys[1], 6)[:2]]
        c1 = jnp.asarray(self.first_color if self.first_color is not None else colors[0])
        c2 = jnp.asarray(self.second_color if self.second_color is not None else colors[1])
        s, _, _ = b.add_door(keys[2], s, 1, 1, 2, color=c1, locked=False)
        s, _, _ = b.add_door(keys[3], s, 1, 1, 0, color=c2, locked=False)
        s = b.place_agent(keys[4], s, 1, 1)

        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, TOP_BEFORE)
        instr = set_leaf(instr, 0, LEAF_OPEN, strict=self.strict)
        instr = set_leaf(instr, 2, LEAF_OPEN)
        room = b.agent_room_mask(s)
        instr = set_desc(instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, OBJ_DOOR, c1, agent_room_mask=room)
        instr = set_desc(instr, 2, 0, s.grid, s.agent_pos, s.agent_dir, OBJ_DOOR, c2, agent_room_mask=room)
        return s, instr, jnp.asarray(True)


class OpenDoorsOrder(RoomGridLevel):
    """Open one or two doors in a given order (reference open.py:326-422)."""

    def __init__(self, num_doors: int, debug: bool = False, max_steps: int | None = None, **kwargs):
        assert num_doors >= 2
        self.num_doors = num_doors
        self.debug = debug
        room_size = 6
        if max_steps is None:
            max_steps = 20 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        n = self.num_doors
        keys = jax.random.split(key, n + 6)
        s = b.init(keys[0])
        colors = jnp.asarray(SORTED_COLOR_IDX)[jax.random.permutation(keys[1], 6)[:n]]
        for i in range(n):
            s, _, _ = b.add_door(keys[2 + i], s, 1, 1, color=colors[i], locked=False)
        s = b.place_agent(keys[n + 2], s, 1, 1)

        # Two distinct doors (reference :410): uniform ordered pair.
        p1 = randint(keys[n + 3], 0, n)
        p2 = (p1 + randint(keys[n + 4], 1, n)) % n
        c1 = colors[p1]
        c2 = colors[p2]

        mode = randint(keys[n + 5], 0, 3)
        instr = empty_instr(b.width, b.height)
        instr = set_top(
            instr,
            jnp.where(mode == 0, TOP_ACTION, jnp.where(mode == 1, TOP_BEFORE, TOP_AFTER)),
        )
        instr = set_leaf(instr, 0, LEAF_OPEN, strict=self.debug)
        # Leaf 2 participates only in modes 1/2.
        instr = instr.replace(
            leaf_kind=instr.leaf_kind.at[2].set(
                jnp.where(mode == 0, -1, LEAF_OPEN)
            ),
            leaf_strict=instr.leaf_strict.at[2].set(self.debug & True),
        )
        room = b.agent_room_mask(s)
        instr = set_desc(instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, OBJ_DOOR, c1, agent_room_mask=room)
        instr = set_desc(instr, 2, 0, s.grid, s.agent_pos, s.agent_dir, OBJ_DOOR, c2, agent_room_mask=room)
        return s, instr, jnp.asarray(True)

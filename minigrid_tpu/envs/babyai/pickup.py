"""BabyAI Pickup levels (reference: minigrid/envs/babyai/pickup.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_PICKUP,
    TOP_ACTION,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel


def _single_pickup(builder, s, d_type, d_color=-1, d_loc=-1, strict=False):
    instr = empty_instr(builder.width, builder.height)
    instr = set_top(instr, TOP_ACTION)
    instr = set_leaf(instr, 0, LEAF_PICKUP, strict=strict)
    instr = set_desc(
        instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, d_type, d_color, d_loc,
        agent_room_mask=builder.agent_room_mask(s),
    )
    return instr


class Pickup(RoomGridLevel):
    """Pick up a named object in a 3x3 maze (reference pickup.py:12-72)."""

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s)
        s = b.connect_all(keys[2], s)
        s, kinds, colors, _ = b.add_distractors(keys[3], s, num_distractors=18, all_unique=False)
        valid = self.check_objs_reachable(s)
        pick = randint(keys[4], 0, 18)
        instr = _single_pickup(b, s, kinds[pick], colors[pick])
        return s, instr, valid


class UnblockPickup(RoomGridLevel):
    """Pick up an object that may require unblocking (reference pickup.py:74-140)."""

    unblocking = True

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s)
        s = b.connect_all(keys[2], s)
        s, kinds, colors, _ = b.add_distractors(keys[3], s, num_distractors=20, all_unique=False)
        # At least one object must be unreachable (reference :134-136).
        valid = ~self.check_objs_reachable(s)
        pick = randint(keys[4], 0, 20)
        instr = _single_pickup(b, s, kinds[pick], colors[pick])
        return s, instr, valid


class PickupDist(RoomGridLevel):
    """Pick up an object described by type, color, or both
    (reference pickup.py:214-289)."""

    def __init__(self, debug: bool = False, **kwargs):
        self.debug = debug
        super().__init__(num_rows=1, num_cols=1, room_size=7, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s, kinds, colors, _ = b.add_distractors(keys[1], s, num_distractors=5)
        s = b.place_agent(keys[2], s, 0, 0)
        pick = randint(keys[3], 0, 5)
        sel = randint(keys[4], 0, 3)  # 0=type, 1=color, 2=both
        d_type = jnp.where(sel == 1, -1, kinds[pick].astype(jnp.int32))
        d_color = jnp.where(sel == 0, -1, colors[pick].astype(jnp.int32))
        instr = _single_pickup(b, s, d_type, d_color, strict=self.debug)
        return s, instr, jnp.asarray(True)


class PickupAbove(RoomGridLevel):
    """Pick up an object in the room above (reference pickup.py:292-361)."""

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(room_size=room_size, max_steps=max_steps, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s, kind, color, _ = b.add_object(keys[1], s, 1, 0)
        s, _, _ = b.add_door(keys[2], s, 1, 1, 3, locked=False)
        s = b.place_agent(keys[3], s, 1, 1)
        s = b.connect_all(keys[4], s)
        instr = _single_pickup(b, s, kind, color)
        return s, instr, jnp.asarray(True)

"""BabyAI PutNext levels (reference: minigrid/envs/babyai/putnext.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import OBJ_EMPTY, cell, pack_carry
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_PUTNEXT,
    TOP_ACTION,
    empty_instr,
    set_desc,
    set_leaf,
    set_top,
    start_carrying_object,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel


def _putnext_instr(builder, s, m_type, m_color, f_type, f_color):
    instr = empty_instr(builder.width, builder.height)
    instr = set_top(instr, TOP_ACTION)
    instr = set_leaf(instr, 0, LEAF_PUTNEXT)
    room = builder.agent_room_mask(s)
    instr = set_desc(instr, 0, 0, s.grid, s.agent_pos, s.agent_dir, m_type, m_color, agent_room_mask=room)
    instr = set_desc(instr, 0, 1, s.grid, s.agent_pos, s.agent_dir, f_type, f_color, agent_room_mask=room)
    return instr


class PutNextLocal(RoomGridLevel):
    """Put an object next to another in a single room
    (reference putnext.py:11-80)."""

    pool_factor = 1.5  # attempt validity ~0.75 (>40-sigma headroom at 2^15 pools)

    def __init__(self, room_size: int = 8, num_objs: int = 8, **kwargs):
        self.num_objs = num_objs
        super().__init__(num_rows=1, num_cols=1, room_size=room_size, **kwargs)

    def gen_attempt(self, key):
        b = self.builder
        keys = jax.random.split(key, 5)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, kinds, colors, _ = b.add_distractors(
            keys[2], s, num_distractors=self.num_objs, all_unique=True
        )
        valid = self.check_objs_reachable(s)
        p1 = randint(keys[3], 0, self.num_objs)
        p2 = (p1 + randint(keys[4], 1, self.num_objs)) % self.num_objs
        instr = _putnext_instr(b, s, kinds[p1], colors[p1], kinds[p2], colors[p2])
        return s, instr, valid


class PutNext(RoomGridLevel):
    """Move an object from one room next to an object in the other
    (reference putnext.py:82-201)."""

    def __init__(
        self,
        room_size: int,
        objs_per_room: int,
        start_carrying: bool = False,
        max_steps: int | None = None,
        **kwargs,
    ):
        assert room_size >= 4 and objs_per_room <= 9
        self.objs_per_room = objs_per_room
        self.start_carrying = start_carrying
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(
            num_rows=1, num_cols=2, room_size=room_size, max_steps=max_steps, **kwargs
        )

    def gen_attempt(self, key):
        b = self.builder
        n = self.objs_per_room
        keys = jax.random.split(key, 8)
        s = b.init(keys[0])
        s = b.place_agent(keys[1], s, 0, 0)
        s, kl, cl, pl = b.add_distractors(keys[2], s, i=0, j=0, num_distractors=n)
        s, kr, cr, pr = b.add_distractors(keys[3], s, i=1, j=0, num_distractors=n)
        s = b.remove_wall(s, 0, 0, 0)

        ia = randint(keys[4], 0, n)
        ib = randint(keys[5], 0, n)
        flip = randint(keys[6], 0, 2) == 0
        a_type = jnp.where(flip, kr[ib], kl[ia])
        a_color = jnp.where(flip, cr[ib], cl[ia])
        a_pos = jnp.where(flip, pr[ib], pl[ia])
        b_type = jnp.where(flip, kl[ia], kr[ib])
        b_color = jnp.where(flip, cl[ia], cr[ib])

        instr = _putnext_instr(b, s, a_type, a_color, b_type, b_color)

        if self.start_carrying:
            # Lift the move object into the agent's hand (reference :190-200).
            instr = start_carrying_object(instr, a_pos)
            grid = g.set_cell(s.grid, a_pos[0], a_pos[1], cell(OBJ_EMPTY))
            s = s.replace(grid=grid)
        return s, instr, jnp.asarray(True)

    def _generate(self, key):
        state = super()._generate(key)
        if not self.start_carrying:
            return state
        # The carried object's (type, color) is exactly the move descriptor.
        instr = state.extra["instr"]
        carrying = pack_carry(instr.d_type[0, 0], instr.d_color[0, 0])
        return state.replace(carrying=carrying)

"""BabyAI LevelGen + Synth/Boss levels
(reference: minigrid/envs/babyai/core/levelgen.py, minigrid/envs/babyai/synth.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_KEY,
    SORTED_COLOR_IDX,
)
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_GOTO,
    LEAF_OPEN,
    LEAF_PICKUP,
    LEAF_PUTNEXT,
    TOP_ACTION,
    TOP_AFTER,
    TOP_AND,
    TOP_BEFORE,
    desc_match_mask,
    empty_instr,
    set_desc,
    set_top,
)
from minigrid_tpu.envs.babyai.core.level import RoomGridLevel

# Type draw order follows the reference's OBJ_TYPES = [box, ball, key, door]
# (verifier.py:15-18).
_TYPE_LIST = jnp.asarray(np.array([OBJ_BOX, OBJ_BALL, OBJ_KEY, OBJ_DOOR], np.int32))
_ACTION_TO_LEAF = {"goto": LEAF_GOTO, "pickup": LEAF_PICKUP, "open": LEAF_OPEN, "putnext": LEAF_PUTNEXT}


def _select_tree(cond, a, b):
    return jax.tree.map(
        lambda x, y: jnp.where(jnp.reshape(cond, (1,) * x.ndim) if x.ndim else cond, x, y),
        a, b,
    )


class LevelGen(RoomGridLevel):
    """Random-instruction level generator (reference levelgen.py:24-210)."""

    def __init__(
        self,
        room_size: int = 8,
        num_rows: int = 3,
        num_cols: int = 3,
        num_dists: int = 18,
        locked_room_prob: float = 0.5,
        locations: bool = True,
        unblocking: bool = True,
        implicit_unlock: bool = True,
        action_kinds=("goto", "pickup", "open", "putnext"),
        instr_kinds=("action", "and", "seq"),
        **kwargs,
    ):
        self.num_dists = num_dists
        self.locked_room_prob = float(locked_room_prob)
        self.locations = bool(locations)
        self.unblocking = bool(unblocking)
        self.implicit_unlock = bool(implicit_unlock)
        self.action_kinds = tuple(action_kinds)
        self.instr_kinds = tuple(instr_kinds)
        super().__init__(
            room_size=room_size, num_rows=num_rows, num_cols=num_cols, **kwargs
        )

    # -- components --------------------------------------------------------------
    def _add_locked_room(self, key, s):
        """(reference levelgen.py:85-112); returns (state, room_flat_idx,
        locked_room_rect)."""
        b = self.builder
        r, c = b.num_rows, b.num_cols
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        # Uniform over (room, wall-with-neighbor) triples (rejection == conditioning).
        i = randint(k1, 0, c)
        j = randint(k2, 0, r)
        wall = b.random_free_wall(k3, s, i, j)
        s, door_color, _ = b.add_door(k4, s, i, j, wall, locked=True)
        # Key in a different room.
        flat = j * c + i
        koff = randint(k5, 1, max(r * c, 2))
        kflat = (flat + koff) % (r * c)
        s, _, _, _ = b.add_object(
            jax.random.fold_in(key, 9), s, kflat % c, kflat // c, kind=OBJ_KEY, color=door_color
        )
        rect = b.room_interior_mask(i, j)
        return s, flat, rect

    def _rand_obj(self, key, s, types_mode, locked_rect, have_locked):
        """Random object descriptor with >=1 match (reference levelgen.py:114-155).

        ``types_mode``: 0 = all four types, 1 = no door, 2 = door only (traced).
        Returns (type, color, loc, ok)."""
        room_mask = self.builder.agent_room_mask(s)

        def attempt(k):
            kc, kt, kb, kl = jax.random.split(k, 4)
            cdraw = randint(kc, 0, 7)
            color = jnp.where(cdraw == 0, -1, jnp.asarray(SORTED_COLOR_IDX)[jnp.clip(cdraw - 1, 0, 5)])
            ntypes = jnp.where(types_mode == 0, 4, jnp.where(types_mode == 1, 3, 1))
            tdraw = jnp.floor(jax.random.uniform(kt) * ntypes.astype(jnp.float32)).astype(jnp.int32)
            typ = jnp.where(types_mode == 2, OBJ_DOOR, _TYPE_LIST[jnp.clip(tdraw, 0, 3)])
            if self.locations:
                use_loc = randint(kb, 0, 2) == 0
                loc = jnp.where(use_loc, randint(kl, 0, 4), -1)
            else:
                loc = jnp.int32(-1)
            mask = desc_match_mask(
                s.grid, typ, color, loc, s.agent_pos, s.agent_dir, room_mask
            )
            ok = mask.any()
            if not self.implicit_unlock:
                outside = mask & ~locked_rect
                ok &= jnp.where(have_locked, outside.any(), True)
            return typ, color, loc, ok

        def cond(carry):
            _, _, _, ok, _, tries = carry
            return ~ok & (tries < 100)

        def body(carry):
            _, _, _, _, k, tries = carry
            k, ka = jax.random.split(k)
            t, c, l, ok = attempt(ka)
            return t, c, l, ok, k, tries + 1

        k0, kl0 = jax.random.split(key)
        t, c, l, ok = attempt(k0)
        t, c, l, ok, _, _ = jax.lax.while_loop(
            cond, body, (t, c, l, ok, kl0, jnp.int32(0))
        )
        return t, c, l, ok

    # -- generation -----------------------------------------------------------------
    def gen_attempt(self, key):
        b = self.builder
        r, c = b.num_rows, b.num_cols
        keys = jax.random.split(key, 24)
        s = b.init(keys[0])

        have_locked = jax.random.uniform(keys[1]) < self.locked_room_prob
        s_locked, locked_flat, locked_rect = self._add_locked_room(keys[2], s)
        s = _select_tree(have_locked, s_locked, s)
        locked_rect = jnp.where(have_locked, locked_rect, jnp.zeros_like(locked_rect))

        s = b.connect_all(keys[3], s)
        s, _, _, _ = b.add_distractors(
            keys[4], s, num_distractors=self.num_dists, all_unique=False
        )

        # Agent anywhere but the locked room (reference levelgen.py:67-73).
        roff = randint(keys[5], 1, max(r * c, 2))
        aflat_locked = (locked_flat + roff) % (r * c)
        aflat_free = randint(keys[6], 0, r * c)
        aflat = jnp.where(have_locked, aflat_locked, aflat_free)
        s = b.place_agent(keys[7], s, aflat % c, aflat // c)

        valid = jnp.asarray(True)
        if not self.unblocking:
            valid &= self.check_objs_reachable(s)

        # -- instruction structure (reference rand_instr, levelgen.py:157-210) --
        ik = self.instr_kinds
        kdraw = randint(keys[8], 0, len(ik))
        is_action = jnp.asarray(False)
        is_and = jnp.asarray(False)
        is_seq = jnp.asarray(False)
        for idx, name in enumerate(ik):
            hit = kdraw == idx
            is_action |= hit & (name == "action")
            is_and |= hit & (name == "and")
            is_seq |= hit & (name == "seq")
        a_is_and = is_seq & (randint(keys[9], 0, 2) == 1)
        b_is_and = is_seq & (randint(keys[10], 0, 2) == 1)
        before = randint(keys[11], 0, 2) == 0
        top = jnp.where(
            is_action, TOP_ACTION,
            jnp.where(is_and, TOP_AND, jnp.where(before, TOP_BEFORE, TOP_AFTER)),
        )
        leaf_active = jnp.stack(
            [
                jnp.asarray(True),
                is_and | a_is_and,
                is_seq,
                b_is_and,
            ]
        )

        instr = empty_instr(b.width, b.height)
        instr = set_top(instr, top, a_is_and=a_is_and, b_is_and=b_is_and)

        ak = self.action_kinds
        leaf_kinds = []
        for leaf in range(4):
            kk = jax.random.split(keys[12 + leaf], 3)
            adraw = randint(kk[0], 0, len(ak))
            kind = jnp.int32(0)
            for idx, name in enumerate(ak):
                kind = jnp.where(adraw == idx, _ACTION_TO_LEAF[name], kind)
            # desc 0: goto -> all types, open -> door, else no door.
            mode0 = jnp.where(
                kind == LEAF_GOTO, 0, jnp.where(kind == LEAF_OPEN, 2, 1)
            )
            t0, c0, l0, ok0 = self._rand_obj(kk[1], s, mode0, locked_rect, have_locked)
            instr = set_desc(
                instr, leaf, 0, s.grid, s.agent_pos, s.agent_dir, t0, c0, l0,
                agent_room_mask=b.agent_room_mask(s),
            )
            # desc 1 only for putnext (all types).
            t1, c1, l1, ok1 = self._rand_obj(kk[2], s, jnp.int32(0), locked_rect, have_locked)
            instr = set_desc(
                instr, leaf, 1, s.grid, s.agent_pos, s.agent_dir, t1, c1, l1,
                agent_room_mask=b.agent_room_mask(s),
            )
            active = leaf_active[leaf]
            valid &= ~active | (ok0 & jnp.where(kind == LEAF_PUTNEXT, ok1, True))
            leaf_kinds.append(jnp.where(active, kind, -1))

        instr = instr.replace(leaf_kind=jnp.stack(leaf_kinds))
        return s, instr, valid


# -- Synth family (reference synth.py) ----------------------------------------


class Synth(LevelGen):
    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18, **kwargs):
        super().__init__(
            room_size=room_size,
            num_rows=num_rows,
            num_cols=num_cols,
            num_dists=num_dists,
            instr_kinds=["action"],
            locations=False,
            unblocking=True,
            implicit_unlock=False,
            **kwargs,
        )


class SynthLoc(LevelGen):
    def __init__(self, **kwargs):
        super().__init__(
            instr_kinds=["action"],
            locations=True,
            unblocking=True,
            implicit_unlock=False,
            **kwargs,
        )


class SynthSeq(LevelGen):
    def __init__(self, **kwargs):
        super().__init__(
            locations=True, unblocking=True, implicit_unlock=False, **kwargs
        )


class MiniBossLevel(LevelGen):
    def __init__(self, **kwargs):
        super().__init__(
            num_cols=2, num_rows=2, room_size=5, num_dists=7, locked_room_prob=0.25, **kwargs
        )


class BossLevel(LevelGen):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)


class BossLevelNoUnlock(LevelGen):
    def __init__(self, **kwargs):
        super().__init__(locked_room_prob=0, implicit_unlock=False, **kwargs)


class GoToSeq(LevelGen):
    """(reference goto.py:527-601)"""

    def __init__(self, room_size=8, num_rows=3, num_cols=3, num_dists=18, **kwargs):
        super().__init__(
            room_size=room_size,
            num_rows=num_rows,
            num_cols=num_cols,
            num_dists=num_dists,
            action_kinds=["goto"],
            locked_room_prob=0,
            locations=False,
            unblocking=False,
            **kwargs,
        )


class PickupLoc(LevelGen):
    """(reference pickup.py:142-212)"""

    def __init__(self, **kwargs):
        super().__init__(
            action_kinds=["pickup"],
            instr_kinds=["action"],
            num_rows=1,
            num_cols=1,
            num_dists=8,
            locked_room_prob=0,
            locations=True,
            unblocking=False,
            **kwargs,
        )

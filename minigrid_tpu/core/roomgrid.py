"""Functional RoomGrid builder.

The reference's ``RoomGrid`` (minigrid/core/roomgrid.py:66-438) is a mutable
env base class holding ``Room`` objects with door/neighbor pointers.  Here the
lattice is static (room_size/num_rows/num_cols are Python ints), and the
dynamic construction state is a small pytree of arrays threaded through pure
builder methods — every sampling step is key-driven and the unbounded
rejection loops become masked categorical draws or bounded ``while_loop``s
with identical acceptance distributions.

Wall-slot representation: the lattice shares door positions between adjacent
rooms, so connectivity is stored per wall slot:
* ``door_y[j, i]``  — sampled y of the door slot in the RIGHT wall of room
  (i, j) (valid for i < num_cols-1)         (reference :159-161)
* ``door_x[j, i]``  — sampled x of the slot in the BOTTOM wall (j < num_rows-1)
* ``open_right[j, i]`` / ``open_down[j, i]`` — a door exists or the wall was
  removed on that slot (the reference's ``room.doors[k]`` truthiness)
* ``locked[j, i]``  — room is behind a locked door (reference :260)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_KEY,
    OBJ_WALL,
    SORTED_COLOR_IDX,
    STATE_CLOSED,
    STATE_LOCKED,
    WALL_CELL,
    cell,
    cell_type,
    with_state,
)
from minigrid_tpu.core.sampling import (
    masked_uniform_index as sample_mask_index,
    randint,
    sample_mask_cell,
)

# Object kinds in the reference's draw order ["key", "ball", "box"]
# (minigrid/core/roomgrid.py:210).
KIND_TABLE = jnp.asarray(np.array([OBJ_KEY, OBJ_BALL, OBJ_BOX], np.int32))
_COMBO_KIND = jnp.asarray(np.repeat(np.array([OBJ_KEY, OBJ_BALL, OBJ_BOX], np.int32), 6))
_COMBO_COLOR = jnp.asarray(np.tile(np.asarray(SORTED_COLOR_IDX, np.int32), 3))


from flax import struct


@struct.dataclass
class RoomGridState:
    """Traced construction state (all fields are jnp arrays; the lattice
    geometry is static on the builder)."""

    grid: jnp.ndarray  # int32[W, H] packed
    door_y: jnp.ndarray  # int32[rows, cols]
    door_x: jnp.ndarray  # int32[rows, cols]
    open_right: jnp.ndarray  # bool[rows, cols]
    open_down: jnp.ndarray  # bool[rows, cols]
    locked: jnp.ndarray  # bool[rows, cols]
    combo_present: jnp.ndarray  # bool[18] — (kind, color) pairs placed
    agent_pos: jnp.ndarray  # int32[2]
    agent_dir: jnp.ndarray  # int32[]
    # Feasibility accumulator: False once any placement found no free cell —
    # the traced counterpart of the reference's place_obj RecursionError
    # (minigrid/minigrid_env.py:339-343), which aborts the whole generation
    # attempt; RoomGridLevel folds it into attempt validity and resamples.
    ok: jnp.ndarray  # bool[]


class RoomGridBuilder:
    """Static lattice geometry + pure construction methods."""

    def __init__(self, room_size: int, num_rows: int, num_cols: int):
        assert room_size >= 3
        self.room_size = room_size
        self.num_rows = num_rows
        self.num_cols = num_cols
        self.width = (room_size - 1) * num_cols + 1
        self.height = (room_size - 1) * num_rows + 1

    # -- lattice geometry (static) -------------------------------------------
    def room_top(self, i, j):
        rs = self.room_size - 1
        return jnp.asarray(i, jnp.int32) * rs, jnp.asarray(j, jnp.int32) * rs

    def room_of_pos(self, x, y):
        rs = self.room_size - 1
        return x // rs, y // rs

    def init(self, key: jax.Array) -> RoomGridState:
        """Lattice walls + per-wall door slots (reference :123-179)."""
        rs = self.room_size - 1
        w, h = self.width, self.height
        xs, ys = np.arange(w), np.arange(h)
        lattice = (xs[:, None] % rs == 0) | (ys[None, :] % rs == 0)
        grid = g.put(g.empty_grid(w, h), jnp.asarray(lattice), WALL_CELL)

        # Door slots: right-wall y in [top+1, top+rs), bottom-wall x likewise
        # (reference :159-164), one uniform draw per interior wall.
        k1, k2 = jax.random.split(key)
        r, c = self.num_rows, self.num_cols
        y_base = (jnp.arange(r, dtype=jnp.int32) * rs)[:, None]
        x_base = (jnp.arange(c, dtype=jnp.int32) * rs)[None, :]
        door_y = y_base + jax.random.randint(k1, (r, c), 1, rs, dtype=jnp.int32)
        door_x = x_base + jax.random.randint(k2, (r, c), 1, rs, dtype=jnp.int32)

        # Agent starts at the middle-room center facing east (reference :172-179).
        agent_pos = jnp.asarray(
            [(c // 2) * rs + self.room_size // 2, (r // 2) * rs + self.room_size // 2],
            jnp.int32,
        )
        return RoomGridState(
            grid=grid,
            door_y=door_y,
            door_x=door_x,
            open_right=jnp.zeros((r, c), bool),
            open_down=jnp.zeros((r, c), bool),
            locked=jnp.zeros((r, c), bool),
            combo_present=jnp.zeros((18,), bool),
            agent_pos=agent_pos,
            agent_dir=jnp.int32(0),
            ok=jnp.asarray(True),
        )

    # -- door helpers ----------------------------------------------------------
    def door_slot(self, s: RoomGridState, i, j, k):
        """(x, y) of the door slot on wall k (0=right,1=down,2=left,3=up) of
        room (i, j); i/j/k may be traced."""
        rs = self.room_size - 1
        i = jnp.asarray(i, jnp.int32)
        j = jnp.asarray(j, jnp.int32)
        k = jnp.asarray(k, jnp.int32)
        # Wall-slot owner room: left/up walls belong to the left/up neighbor.
        oi = jnp.where(k == 2, i - 1, i)
        oj = jnp.where(k == 3, j - 1, j)
        oi_c = jnp.clip(oi, 0, self.num_cols - 1)
        oj_c = jnp.clip(oj, 0, self.num_rows - 1)
        horizontal = (k == 0) | (k == 2)
        x = jnp.where(horizontal, (oi_c + 1) * rs, s.door_x[oj_c, oi_c])
        y = jnp.where(horizontal, s.door_y[oj_c, oi_c], (oj_c + 1) * rs)
        valid = jnp.where(
            horizontal,
            (oi >= 0) & (oi < self.num_cols - 1) & (j >= 0) & (j < self.num_rows),
            (oj >= 0) & (oj < self.num_rows - 1) & (i >= 0) & (i < self.num_cols),
        )
        return x, y, valid, oi_c, oj_c, horizontal

    def wall_open(self, s: RoomGridState, i, j, k):
        _, _, valid, oi, oj, horizontal = self.door_slot(s, i, j, k)
        return valid & jnp.where(horizontal, s.open_right[oj, oi], s.open_down[oj, oi])

    def _set_wall_open(self, s: RoomGridState, i, j, k) -> RoomGridState:
        _, _, _, oi, oj, horizontal = self.door_slot(s, i, j, k)
        open_right = jnp.where(
            horizontal, s.open_right.at[oj, oi].set(True), s.open_right
        )
        open_down = jnp.where(
            horizontal, s.open_down, s.open_down.at[oj, oi].set(True)
        )
        return s.replace(open_right=open_right, open_down=open_down)

    def random_free_wall(self, key: jax.Array, s: RoomGridState, i, j):
        """Uniformly pick a wall of room (i, j) that has a neighbor and no
        door yet (the reference's add_door door_idx=None rejection loop,
        minigrid/core/roomgrid.py:244-250)."""
        valids = []
        for k in range(4):
            _, _, valid, oi, oj, horizontal = self.door_slot(s, i, j, k)
            occupied = jnp.where(
                horizontal, s.open_right[oj, oi], s.open_down[oj, oi]
            )
            valids.append(valid & ~occupied)
        logits = jnp.where(jnp.stack(valids), 0.0, -jnp.inf)
        return jax.random.categorical(key, logits)

    def add_door(
        self,
        key: jax.Array,
        s: RoomGridState,
        i,
        j,
        k=None,
        color=None,
        locked=None,
    ):
        """Place a door on wall k of room (i, j) (reference :230-274);
        k=None picks a random free wall.  Returns (state, color, (x, y))."""
        k_color, k_locked, k_wall = jax.random.split(key, 3)
        if k is None:
            k = self.random_free_wall(k_wall, s, i, j)
        if color is None:
            color = jnp.asarray(SORTED_COLOR_IDX)[randint(k_color, 0, 6)]
        color = jnp.asarray(color, jnp.int32)
        if locked is None:
            locked = randint(k_locked, 0, 2) == 0  # reference _rand_bool
        locked = jnp.asarray(locked)

        x, y, _, _, _, _ = self.door_slot(s, i, j, k)
        door_state = jnp.where(locked, STATE_LOCKED, STATE_CLOSED)
        grid = g.set_cell(s.grid, x, y, cell(OBJ_DOOR, color, door_state))
        s = s.replace(grid=grid)
        s = self._set_wall_open(s, i, j, k)
        # room.locked is set on the room add_door was called on (reference :260).
        ii = jnp.clip(jnp.asarray(i, jnp.int32), 0, self.num_cols - 1)
        jj = jnp.clip(jnp.asarray(j, jnp.int32), 0, self.num_rows - 1)
        new_locked = s.locked.at[jj, ii].set(locked)
        return s.replace(locked=new_locked), color, jnp.stack([x, y])

    def remove_wall(self, s: RoomGridState, i, j, k) -> RoomGridState:
        """Clear the interior cells of wall k of room (i, j) (reference :276-311)."""
        rs = self.room_size - 1
        tx, ty = self.room_top(i, j)
        w, h = self.width, self.height
        xs, ys = g.coord_grids(w, h)
        k = jnp.asarray(k, jnp.int32)
        # Wall line coordinates per k.
        vert = (k == 0) | (k == 2)
        wall_x = jnp.where(k == 0, tx + rs, tx)  # for vertical walls
        wall_y = jnp.where(k == 1, ty + rs, ty)  # for horizontal walls
        vmask = (xs == wall_x) & (ys > ty) & (ys < ty + rs)
        hmask = (ys == wall_y) & (xs > tx) & (xs < tx + rs)
        mask = jnp.where(vert, vmask, hmask)
        from minigrid_tpu.core.constants import EMPTY_CELL

        s = s.replace(grid=g.put(s.grid, mask, EMPTY_CELL))
        return self._set_wall_open(s, i, j, k)

    # -- object placement -------------------------------------------------------
    def room_interior_mask(self, i, j) -> jnp.ndarray:
        tx, ty = self.room_top(i, j)
        return g.rect_mask(self.width, self.height, tx, ty, self.room_size, self.room_size)

    def place_in_room(self, key: jax.Array, s: RoomGridState, i, j, cell_value):
        """Place ``cell_value`` on a free cell of room (i, j), not within
        manhattan distance 2 of the agent (reference :181-196 with
        reject_next_to :11-20).  Returns (state, pos)."""
        xs, ys = g.coord_grids(self.width, self.height)
        near_agent = (
            jnp.abs(xs - s.agent_pos[0]) + jnp.abs(ys - s.agent_pos[1])
        ) < 2
        m = g.free_mask(s.grid, s.agent_pos) & self.room_interior_mask(i, j) & ~near_agent
        pos = sample_mask_cell(key, m)
        grid = g.set_cell(s.grid, pos[0], pos[1], cell_value)
        return s.replace(grid=grid, ok=s.ok & m.any()), pos

    def add_object(self, key: jax.Array, s: RoomGridState, i, j, kind=None, color=None):
        """Add a key/ball/box of the given or random kind/color
        (reference :198-228).  Returns (state, kind, color, pos)."""
        k_kind, k_color, k_place = jax.random.split(key, 3)
        if kind is None:
            kind = KIND_TABLE[randint(k_kind, 0, 3)]
        kind = jnp.asarray(kind, jnp.int32)
        if color is None:
            color = jnp.asarray(SORTED_COLOR_IDX)[randint(k_color, 0, 6)]
        color = jnp.asarray(color, jnp.int32)
        s, pos = self.place_in_room(k_place, s, i, j, cell(kind, color))
        combo_idx = self._combo_index(kind, color)
        s = s.replace(combo_present=s.combo_present.at[combo_idx].set(True))
        return s, kind, color, pos

    @staticmethod
    def _combo_index(kind, color):
        """Index into the 18-entry (kind, color) table."""
        kind_idx = jnp.where(kind == OBJ_KEY, 0, jnp.where(kind == OBJ_BALL, 1, 2))
        # color is a raw color index; map back to sorted order position.
        sorted_pos = jnp.argmax(
            jnp.asarray(SORTED_COLOR_IDX) == jnp.asarray(color, jnp.int32)
        )
        return kind_idx * 6 + sorted_pos

    def place_agent(self, key: jax.Array, s: RoomGridState, i=None, j=None):
        """Place the agent in room (i, j) (random room if unspecified) on a
        free cell with nothing but empty/wall in front (reference :313-334).
        The reference's propose-and-reject over (pos, dir) is uniform over the
        acceptance set, so we sample that set directly."""
        k_room_i, k_room_j, k_pose = jax.random.split(key, 3)
        if i is None:
            i = randint(k_room_i, 0, self.num_cols)
        if j is None:
            j = randint(k_room_j, 0, self.num_rows)

        w, h = self.width, self.height
        free = g.free_mask(s.grid) & self.room_interior_mask(i, j)
        obj = cell_type(s.grid)
        front_ok_map = (obj == OBJ_EMPTY) | (obj == OBJ_WALL)
        # front_ok[x, y, d] = front_ok_map at (x, y) + DIR_TO_VEC[d]; free
        # cells are interior so the shifted reads stay in bounds.
        pads = []
        padded = jnp.pad(front_ok_map, 1, constant_values=True)
        for dx, dy in ((1, 0), (0, 1), (-1, 0), (0, -1)):
            pads.append(padded[1 + dx : 1 + dx + w, 1 + dy : 1 + dy + h])
        front_ok = jnp.stack(pads, axis=-1)  # [W, H, 4]
        m = free[:, :, None] & front_ok
        idx = sample_mask_index(k_pose, m.reshape(-1))
        d = idx % 4
        xy = idx // 4
        pos = jnp.stack([xy // h, xy % h]).astype(jnp.int32)
        return s.replace(
            agent_pos=pos, agent_dir=d.astype(jnp.int32), ok=s.ok & m.any()
        )

    def agent_room_mask(self, s: RoomGridState) -> jnp.ndarray:
        """bool[W, H] rect (walls included) of the agent's current room
        (the reference's Room.pos_inside, minigrid/core/roomgrid.py:49-63)."""
        ai, aj = self.room_of_pos(s.agent_pos[0], s.agent_pos[1])
        return self.room_interior_mask(ai, aj)

    def open_all_doors(self, s: RoomGridState) -> RoomGridState:
        """Set every door's state to open (reference
        minigrid/envs/babyai/core/roomgrid_level.py:237-247)."""
        is_door = cell_type(s.grid) == OBJ_DOOR
        grid = jnp.where(is_door, with_state(s.grid, 0), s.grid)
        return s.replace(grid=grid)

    # -- connectivity ------------------------------------------------------------
    def reach_mask(self, s: RoomGridState) -> jnp.ndarray:
        """bool[rows, cols] of rooms reachable from the agent's room through
        open wall slots (the reference's find_reach DFS, :348-359; locked
        doors count as connections)."""
        r, c = self.num_rows, self.num_cols
        ai, aj = self.room_of_pos(s.agent_pos[0], s.agent_pos[1])
        reach = (
            (jnp.arange(c)[None, :] == ai) & (jnp.arange(r)[:, None] == aj)
        )
        def body(_, reach):
            right = jnp.pad(reach[:, :-1] & s.open_right[:, :-1], ((0, 0), (1, 0)))
            left = jnp.pad(reach[:, 1:] & s.open_right[:, :-1], ((0, 0), (0, 1)))
            down = jnp.pad(reach[:-1, :] & s.open_down[:-1, :], ((1, 0), (0, 0)))
            up = jnp.pad(reach[1:, :] & s.open_down[:-1, :], ((0, 1), (0, 0)))
            return reach | right | left | down | up
        return jax.lax.fori_loop(0, r * c, body, reach)

    def _room_components(self, s: RoomGridState) -> jnp.ndarray:
        """int32[rows, cols] connected-component labels over open wall slots
        (min-label propagation; lattice diameter bounds the trip count)."""
        r, c = self.num_rows, self.num_cols
        lab = jnp.arange(r * c, dtype=jnp.int32).reshape(r, c)

        def body(_, lab):
            big = jnp.int32(r * c + 1)
            right = jnp.where(s.open_right[:, : c - 1], lab[:, 1:], big)
            left = jnp.where(s.open_right[:, : c - 1], lab[:, : c - 1], big)
            down = jnp.where(s.open_down[: r - 1, :], lab[1:, :], big)
            up = jnp.where(s.open_down[: r - 1, :], lab[: r - 1, :], big)
            m = lab
            m = m.at[:, : c - 1].min(right)
            m = m.at[:, 1:].min(left)
            m = m.at[: r - 1, :].min(down)
            m = m.at[1:, :].min(up)
            return m

        return jax.lax.fori_loop(0, r + c, body, lab)

    def connect_all(
        self,
        key: jax.Array,
        s: RoomGridState,
        door_colors=None,
        max_itrs: int | None = None,
        exclude_color=None,
    ) -> RoomGridState:
        """Randomly add open doors until every room is reachable
        (reference :336-394).  The reference rejection-samples (i, j, k) and
        skips missing/occupied/locked slots; conditioned on acceptance each
        accepted draw is uniform over the currently valid slots, so here the
        loop samples that set DIRECTLY — the while_loop runs once per door
        added (~lattice size) instead of once per raw draw, and connectivity
        is tracked with incremental component labels (a 5000-draw rejection
        tail batched over 10k envs costs seconds per reset chunk otherwise).
        ``exclude_color`` (traced, -1 = none) removes one color from the
        palette (BabyAI Unlock, babyai/unlock.py:83-88)."""
        if door_colors is None:
            color_table = jnp.asarray(SORTED_COLOR_IDX)
        else:
            color_table = jnp.asarray(np.asarray(door_colors, np.int32))
        n_colors = int(color_table.shape[0])
        if exclude_color is None:
            exclude_color = jnp.int32(-1)
        excl_pos = jnp.argmax(color_table == jnp.asarray(exclude_color, jnp.int32))
        has_excl = (color_table == jnp.asarray(exclude_color, jnp.int32)).any()
        r, c = self.num_rows, self.num_cols
        if r * (c - 1) + (r - 1) * c == 0:
            return s  # single room: no interior walls, nothing to connect
        if max_itrs is None:
            max_itrs = 4 * r * c  # every slot can be doored at most once

        def slot_masks(s, lab):
            """Valid (addable) right/down wall slots whose sides are in
            different components (adding within a component is possible in
            the reference but never needed for connectivity; the reference
            adds them anyway — keep them eligible for distribution parity)."""
            not_locked = ~s.locked
            right_ok = (
                ~s.open_right[:, : c - 1]
                & not_locked[:, : c - 1]
                & not_locked[:, 1:]
            )
            down_ok = (
                ~s.open_down[: r - 1, :] & not_locked[: r - 1, :] & not_locked[1:, :]
            )
            return right_ok, down_ok

        def cond(carry):
            s, lab, key, itr = carry
            return (~(lab == lab[0, 0]).all()) & (itr < max_itrs)

        def body(carry):
            s, lab, key, itr = carry
            key, k_slot, kc = jax.random.split(key, 3)
            right_ok, down_ok = slot_masks(s, lab)
            flat = jnp.concatenate(
                [right_ok.reshape(-1), down_ok.reshape(-1)]
            )
            logits = jnp.where(flat, 0.0, -jnp.inf)
            any_valid = flat.any()
            pick = jax.random.categorical(k_slot, logits)
            n_right = r * (c - 1)
            is_right = pick < n_right
            # Decode to the owner room (oj, oi) of the wall slot.
            rj = jnp.clip(pick, 0, n_right - 1) // (c - 1)
            ri = jnp.clip(pick, 0, n_right - 1) % (c - 1)
            dj = jnp.clip(pick - n_right, 0, (r - 1) * c - 1) // c
            di = jnp.clip(pick - n_right, 0, (r - 1) * c - 1) % c
            oj = jnp.where(is_right, rj, dj)
            oi = jnp.where(is_right, ri, di)
            rs = self.room_size - 1
            x = jnp.where(is_right, (oi + 1) * rs, s.door_x[oj, oi])
            y = jnp.where(is_right, s.door_y[oj, oi], (oj + 1) * rs)

            r_full = randint(kc, 0, n_colors)
            r_less = jax.random.randint(
                jax.random.fold_in(kc, 1), (), 0, max(n_colors - 1, 1), dtype=jnp.int32
            )
            idx = jnp.where(has_excl, r_less + (r_less >= excl_pos), r_full)
            color = color_table[idx]
            do = any_valid
            new_grid = g.set_cell(s.grid, x, y, cell(OBJ_DOOR, color, STATE_CLOSED))
            new_or = jnp.where(
                is_right, s.open_right.at[oj, oi].set(True), s.open_right
            )
            new_od = jnp.where(
                is_right, s.open_down, s.open_down.at[oj, oi].set(True)
            )
            s = s.replace(
                grid=jnp.where(do, new_grid, s.grid),
                open_right=jnp.where(do, new_or, s.open_right),
                open_down=jnp.where(do, new_od, s.open_down),
            )
            # Merge the two components (incremental union).
            nj = jnp.where(is_right, oj, oj + 1)
            ni = jnp.where(is_right, oi + 1, oi)
            la = lab[oj, oi]
            lb = lab[nj, ni]
            lo = jnp.minimum(la, lb)
            hi = jnp.maximum(la, lb)
            lab = jnp.where(do & (lab == hi), lo, lab)
            return (s, lab, key, itr + 1)

        lab0 = self._room_components(s)
        s, _, _, _ = jax.lax.while_loop(cond, body, (s, lab0, key, jnp.int32(0)))
        return s

    def add_distractors(
        self,
        key: jax.Array,
        s: RoomGridState,
        i=None,
        j=None,
        num_distractors: int = 10,
        all_unique: bool = True,
    ):
        """Add random distractor objects (reference :396-438).  Returns
        (state, kinds[n], colors[n], positions[n,2])."""
        if num_distractors == 0:
            return (
                s,
                jnp.zeros((0,), jnp.int32),
                jnp.zeros((0,), jnp.int32),
                jnp.zeros((0, 2), jnp.int32),
            )
        # One traced placement body scanned over the distractor count (an
        # unrolled loop multiplies the generator graph ~n-fold and costs
        # minutes of XLA compile time for the 18-distractor BabyAI mazes).
        ii = None if i is None else jnp.asarray(i, jnp.int32)
        jj = None if j is None else jnp.asarray(j, jnp.int32)

        # Fast path: when every distractor draws from the SAME room (room
        # given, or the grid has only one room) the n sequential uniform
        # draws over the shrinking free set are exactly sampling without
        # replacement — identical joint distribution in one Gumbel top-k,
        # no n-step scan dependency chain in the generator graph.
        if (ii is not None and jj is not None) or (
            self.num_rows == 1 and self.num_cols == 1
        ):
            return self._add_distractors_fixed_room(
                key,
                s,
                ii if ii is not None else jnp.int32(0),
                jj if jj is not None else jnp.int32(0),
                num_distractors,
                all_unique,
            )

        return self._add_distractors_multi_room(key, s, num_distractors, all_unique)

    def _add_distractors_multi_room(
        self, key: jax.Array, s: RoomGridState, n: int, all_unique: bool
    ):
        """Single-shot distractor placement with a random room per distractor.

        Distribution-equivalent to the reference's sequential loop
        (minigrid/core/roomgrid.py:396-438): conditional on the iid room
        assignments, the per-room position draws are independent
        without-replacement samples over DISJOINT cell sets, so one shared
        Gumbel field scores every cell and distractor i takes the cell of
        its room ranked by how many same-room predecessors it has.  The
        (kind, color) draws are independent of positions (iid, or unique
        combos via their own Gumbel top-k).
        """
        w, h = self.width, self.height
        k_ri, k_rj, k_pos, k_combo, k_kind, k_color = jax.random.split(key, 6)
        ri = jax.random.randint(k_ri, (n,), 0, self.num_cols, dtype=jnp.int32)
        rj = jax.random.randint(k_rj, (n,), 0, self.num_rows, dtype=jnp.int32)
        order = jnp.arange(n)
        same_room = (ri[None, :] == ri[:, None]) & (rj[None, :] == rj[:, None])
        rank = (same_room & (order[None, :] < order[:, None])).sum(-1)  # [n]

        xs, ys = g.coord_grids(w, h)
        near_agent = (
            jnp.abs(xs - s.agent_pos[0]) + jnp.abs(ys - s.agent_pos[1])
        ) < 2
        base = g.free_mask(s.grid, s.agent_pos) & ~near_agent  # [W, H]
        rs = self.room_size - 1
        tx, ty = ri * rs, rj * rs  # [n]
        inroom = (
            (xs[None] >= tx[:, None, None])
            & (xs[None] < (tx + self.room_size)[:, None, None])
            & (ys[None] >= ty[:, None, None])
            & (ys[None] < (ty + self.room_size)[:, None, None])
        )  # [n, W, H]
        noise = jax.random.gumbel(k_pos, (w * h,))
        scores = jnp.where(
            (base[None] & inroom).reshape(n, -1), noise[None, :], -jnp.inf
        )
        vals, idxs = jax.lax.top_k(scores, min(n, w * h))  # [n, n] per-room order
        flat_idx = idxs[order, rank]  # [n]
        positions = jnp.stack([flat_idx // h, flat_idx % h], axis=-1).astype(jnp.int32)
        # A -inf pick means distractor i's room ran out of free cells — the
        # reference's place_obj would RecursionError and abort the attempt
        # (roomgrid.py:410 via minigrid_env.py:339-343); flag instead of
        # silently writing to an arbitrary cell.
        feasible = jnp.isfinite(vals[order, rank]).all()

        if all_unique:
            cnoise = jax.random.gumbel(k_combo, (s.combo_present.shape[0],))
            cscores = jnp.where(s.combo_present, -jnp.inf, cnoise)
            _, combos = jax.lax.top_k(cscores, n)
            kinds = _COMBO_KIND[combos]
            colors = _COMBO_COLOR[combos]
        else:
            kinds = KIND_TABLE[jax.random.randint(k_kind, (n,), 0, 3, dtype=jnp.int32)]
            colors = jnp.asarray(SORTED_COLOR_IDX)[
                jax.random.randint(k_color, (n,), 0, 6, dtype=jnp.int32)
            ]

        vals = cell(kinds, colors)
        onehot = flat_idx[:, None] == jnp.arange(w * h, dtype=jnp.int32)[None, :]
        overlay = jnp.max(jnp.where(onehot, vals[:, None], 0), axis=0)
        placed = onehot.any(axis=0)
        grid = jnp.where(placed, overlay, s.grid.reshape(-1)).reshape(w, h)

        kind_idx = jnp.where(kinds == OBJ_KEY, 0, jnp.where(kinds == OBJ_BALL, 1, 2))
        sorted_pos = (
            jnp.asarray(SORTED_COLOR_IDX)[None, :] == colors[:, None]
        ).argmax(-1)
        combo_present = s.combo_present.at[kind_idx * 6 + sorted_pos].set(True)
        return (
            s.replace(grid=grid, combo_present=combo_present, ok=s.ok & feasible),
            kinds.astype(jnp.int32),
            colors.astype(jnp.int32),
            positions,
        )

    def _add_distractors_fixed_room(
        self, key: jax.Array, s: RoomGridState, i, j, n: int, all_unique: bool
    ):
        """Single-shot distractor placement for a fixed room.

        Gumbel top-k over the free-cell mask yields the same joint
        distribution as the reference's n sequential uniform draws
        (minigrid/core/roomgrid.py:396-438 with place_in_room/add_object):
        with equal logits, successive argmaxes of one Gumbel-perturbed field
        ARE uniform draws without replacement, and the eligibility mask is
        static across the n draws when the room is fixed (occupancy changes
        are exactly the without-replacement exclusions).  Same for the
        all_unique (kind, color) combos over the 18-entry table.
        """
        w, h = self.width, self.height
        k_pos, k_combo, k_kind, k_color = jax.random.split(key, 4)
        xs, ys = g.coord_grids(w, h)
        near_agent = (
            jnp.abs(xs - s.agent_pos[0]) + jnp.abs(ys - s.agent_pos[1])
        ) < 2
        m = (
            g.free_mask(s.grid, s.agent_pos)
            & self.room_interior_mask(i, j)
            & ~near_agent
        )
        noise = jax.random.gumbel(k_pos, (w * h,))
        scores = jnp.where(m.reshape(-1), noise, -jnp.inf)
        vals, flat_idx = jax.lax.top_k(scores, n)  # ordered like sequential draws
        positions = jnp.stack([flat_idx // h, flat_idx % h], axis=-1).astype(jnp.int32)
        # Fewer than n free cells ⇒ the reference's sequential loop would
        # RecursionError; flag instead of writing to an arbitrary cell.
        feasible = jnp.isfinite(vals).all()

        if all_unique:
            cnoise = jax.random.gumbel(k_combo, (s.combo_present.shape[0],))
            cscores = jnp.where(s.combo_present, -jnp.inf, cnoise)
            _, combos = jax.lax.top_k(cscores, n)
            kinds = _COMBO_KIND[combos]
            colors = _COMBO_COLOR[combos]
        else:
            kinds = KIND_TABLE[jax.random.randint(k_kind, (n,), 0, 3, dtype=jnp.int32)]
            colors = jnp.asarray(SORTED_COLOR_IDX)[
                jax.random.randint(k_color, (n,), 0, 6, dtype=jnp.int32)
            ]

        vals = cell(kinds, colors)  # int32[n] packed
        onehot = flat_idx[:, None] == jnp.arange(w * h, dtype=jnp.int32)[None, :]
        overlay = jnp.max(jnp.where(onehot, vals[:, None], 0), axis=0)
        placed = onehot.any(axis=0)
        grid = jnp.where(placed, overlay, s.grid.reshape(-1)).reshape(w, h)

        kind_idx = jnp.where(kinds == OBJ_KEY, 0, jnp.where(kinds == OBJ_BALL, 1, 2))
        sorted_pos = (
            jnp.asarray(SORTED_COLOR_IDX)[None, :] == colors[:, None]
        ).argmax(-1)
        combo_present = s.combo_present.at[kind_idx * 6 + sorted_pos].set(True)
        return (
            s.replace(grid=grid, combo_present=combo_present, ok=s.ok & feasible),
            kinds.astype(jnp.int32),
            colors.astype(jnp.int32),
            positions,
        )

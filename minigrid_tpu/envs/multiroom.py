"""MultiRoom (reference: minigrid/envs/multiroom.py:18-279).

The reference places a chain of connected rooms with a recursive
backtracking routine.  The recursion is effectively sequential — a failed
child placement is retried up to 8 times locally and never unwinds further —
so the device version is an explicit bounded chain walk inside a
``while_loop`` that restarts (as the reference's outer ``while`` does) until
a full-length chain fits.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.constants import (
    GOAL_CELL,
    OBJ_DOOR,
    SORTED_COLOR_IDX,
    STATE_CLOSED,
    WALL_CELL,
    cell,
)
from minigrid_tpu.core.env import MiniGridEnv
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, sample_mask_cell
from minigrid_tpu.core.state import EnvState, new_state

_MISSION = register_mission("traverse the rooms to get to the goal")


def _dyn_randint(key, lo, hi):
    """Uniform int in [lo, hi) with traced bounds (hi > lo)."""
    u = jax.random.uniform(key)
    return (lo + jnp.floor(u * (hi - lo).astype(jnp.float32)).astype(jnp.int32)).astype(jnp.int32)


class MultiRoomEnv(MiniGridEnv):
    expensive_reset = True
    """Chain of connected rooms with colored doors; goal in the last room
    (reference: minigrid/envs/multiroom.py:112-279)."""

    def __init__(
        self,
        minNumRooms: int,
        maxNumRooms: int,
        maxRoomSize: int = 10,
        max_steps: int | None = None,
        **kwargs,
    ):
        assert 0 < minNumRooms <= maxNumRooms and maxRoomSize >= 4
        self.min_rooms = minNumRooms
        self.max_rooms = maxNumRooms
        self.max_room_size = maxRoomSize
        if max_steps is None:
            max_steps = maxNumRooms * 20
        super().__init__(width=25, height=25, max_steps=max_steps, **kwargs)

    def _try_chain(self, key, num_rooms):
        """One chain-building attempt (the reference's _placeRoom recursion,
        :186-279): rooms placed sequentially, each retried up to 8 times.
        One traced room-body scanned over R rooms (a Python-unrolled R x 8
        loop compiles for minutes at R=6).  Returns (tops, sizes, entries,
        count)."""
        R = self.max_rooms
        w, h = self.width, self.height
        min_sz, max_sz = 4, self.max_room_size

        k_first1, k_first2, k_scan = jax.random.split(key, 3)
        entry_pos0 = jnp.stack(
            [
                jax.random.randint(k_first1, (), 0, w - 2, dtype=jnp.int32),
                jax.random.randint(k_first2, (), 0, w - 2, dtype=jnp.int32),
            ]
        )
        attempt_keys = jax.random.split(k_scan, R * 8 * 6).reshape(R, 8, 6, 2)

        def room_scan(carry, xs):
            tops, sizes, entries, entry_pos, entry_wall, count, alive = carry
            k, keys8 = xs  # traced room index, [8, 6, 2] attempt keys
            first = k == 0

            def attempt(a, st):
                tops, sizes, entries, entry_pos_a, entry_wall_a, placed = st
                ka, kb, kc, kd, ke, kf = (keys8[a, i] for i in range(6))
                # Exit wall: uniform over sorted({0,1,2,3} - {entry_wall})
                # (reference :243-246); unused for the first room.
                r3 = jax.random.randint(ka, (), 0, 3, dtype=jnp.int32)
                exit_wall = r3 + (r3 >= entry_wall_a)
                next_entry_wall = jnp.where(first, entry_wall_a, (exit_wall + 2) % 4)
                # Room size (reference :187-189) — drawn per attempt.
                sx = jax.random.randint(kb, (), min_sz, max_sz + 1, dtype=jnp.int32)
                sy = jax.random.randint(kc, (), min_sz, max_sz + 1, dtype=jnp.int32)

                # Exit door position on the previous room's chosen wall
                # (reference :248-262); clamped reads are fine when first.
                kprev = jnp.maximum(k - 1, 0)
                ptop, psize = tops[kprev], sizes[kprev]
                along_y = (exit_wall == 0) | (exit_wall == 2)
                off = jnp.where(
                    along_y,
                    _dyn_randint(kd, jnp.int32(1), psize[1] - 1),
                    _dyn_randint(kd, jnp.int32(1), psize[0] - 1),
                )
                dx = jnp.where(
                    exit_wall == 0, ptop[0] + psize[0] - 1,
                    jnp.where(exit_wall == 2, ptop[0], ptop[0] + off),
                )
                dy = jnp.where(
                    exit_wall == 1, ptop[1] + psize[1] - 1,
                    jnp.where(exit_wall == 3, ptop[1], ptop[1] + off),
                )
                door_pos = jnp.stack([dx, dy])
                # New room top from its entry wall (reference :191-215).
                ew = next_entry_wall
                u = _dyn_randint(ke, jnp.int32(0), jnp.maximum(sx - 2, 1))
                v = _dyn_randint(kf, jnp.int32(0), jnp.maximum(sy - 2, 1))
                tx = jnp.where(
                    ew == 0, dx - sx + 1, jnp.where(ew == 2, dx, dx - sx + 2 + u)
                )
                ty = jnp.where(
                    ew == 1, dy - sy + 1, jnp.where(ew == 3, dy, dy - sy + 2 + v)
                )
                top = jnp.where(first, entry_pos_a, jnp.stack([tx, ty]))

                # Bounds (reference :217-221; note the >= on height).
                ok = (top[0] >= 0) & (top[1] >= 0)
                ok &= (top[0] + sx <= w) & (top[1] + sy < h)
                # Overlap vs rooms[0..k-2] (reference :223-233).
                idx = jnp.arange(R)
                others = idx < (k - 1)
                no_olap = (
                    (top[0] + sx < tops[:, 0])
                    | (tops[:, 0] + sizes[:, 0] <= top[0])
                    | (top[1] + sy < tops[:, 1])
                    | (tops[:, 1] + sizes[:, 1] <= top[1])
                )
                ok &= (no_olap | ~others).all()
                # First room gets exactly one attempt (reference :121-130).
                do_place = alive & ~placed & ok & (~first | (a == 0))

                tops = jnp.where(do_place, tops.at[k].set(top), tops)
                sizes = jnp.where(
                    do_place, sizes.at[k].set(jnp.stack([sx, sy])), sizes
                )
                entries = jnp.where(do_place, entries.at[k].set(door_pos), entries)
                entry_wall_a = jnp.where(do_place, next_entry_wall, entry_wall_a)
                return (tops, sizes, entries, entry_pos_a, entry_wall_a, placed | do_place)

            st = (tops, sizes, entries, entry_pos, entry_wall, jnp.bool_(False))
            tops, sizes, entries, entry_pos, entry_wall, placed = jax.lax.fori_loop(
                0, 8, attempt, st
            )
            count = count + (placed & (count == k)).astype(jnp.int32)
            alive = alive & placed & (count < num_rooms)
            return (tops, sizes, entries, entry_pos, entry_wall, count, alive), None

        carry0 = (
            jnp.zeros((R, 2), jnp.int32),
            jnp.zeros((R, 2), jnp.int32),
            jnp.zeros((R, 2), jnp.int32),
            entry_pos0,
            jnp.int32(2),  # first entry wall = left (reference :121-130)
            jnp.int32(0),
            jnp.bool_(True),
        )
        (tops, sizes, entries, _, _, count, _), _ = jax.lax.scan(
            room_scan, carry0, (jnp.arange(R, dtype=jnp.int32), attempt_keys)
        )
        return tops, sizes, entries, count

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        k_num, k_chain0, k_loop = jax.random.split(key, 3)
        num_rooms = jax.random.randint(
            k_num, (), self.min_rooms, self.max_rooms + 1, dtype=jnp.int32
        )

        # Outer rejection loop: rebuild chains until one reaches num_rooms
        # (reference :118-134).  Bounded at 200 attempts (practically always
        # succeeds in a handful).
        def cond(carry):
            _, _, _, count, key, itr = carry
            return (count < num_rooms) & (itr < 200)

        def body(carry):
            tops, sizes, entries, _, key, itr = carry
            key, kc = jax.random.split(key)
            t, s, e, c = self._try_chain(kc, num_rooms)
            return (t, s, e, c, key, itr + 1)

        t0, s0, e0, c0 = self._try_chain(k_chain0, num_rooms)
        tops, sizes, entries, count, key2, _ = jax.lax.while_loop(
            cond, body, (t0, s0, e0, c0, k_loop, jnp.int32(0))
        )

        # Draw the rooms in order: walls then entry door (reference :146-176).
        R = self.max_rooms
        keys = jax.random.split(key2, R + 4)
        door_keys = jnp.stack([jnp.asarray(k) for k in keys[:R]])

        def paint(k, st):
            grid, prev_color_pos = st
            active = k < count
            outline = g.rect_mask(
                w, h, tops[k, 0], tops[k, 1], sizes[k, 0], sizes[k, 1]
            ) & ~g.rect_mask(
                w, h, tops[k, 0] + 1, tops[k, 1] + 1, sizes[k, 0] - 2, sizes[k, 1] - 2
            )
            grid = g.put(grid, outline & active, WALL_CELL)
            # Door color differs from the previous door's (reference :162-170):
            # uniform over the sorted color list minus the previous color.
            r = jax.random.randint(door_keys[k], (), 0, 6, dtype=jnp.int32)
            r5 = jax.random.randint(
                jax.random.fold_in(door_keys[k], 1), (), 0, 5, dtype=jnp.int32
            )
            pos_in_sorted = jnp.where(
                prev_color_pos < 0, r, r5 + (r5 >= prev_color_pos)
            )
            color = jnp.asarray(SORTED_COLOR_IDX)[pos_in_sorted]
            door_cell = cell(OBJ_DOOR, color, STATE_CLOSED)
            new_grid = g.set_cell(grid, entries[k, 0], entries[k, 1], door_cell)
            draw_door = active & (k > 0)
            grid = jnp.where(draw_door, new_grid, grid)
            prev_color_pos = jnp.where(draw_door, pos_in_sorted, prev_color_pos)
            return grid, prev_color_pos

        grid, _ = jax.lax.fori_loop(
            0, R, paint, (g.empty_grid(w, h), jnp.int32(-1))
        )

        # Agent in the first room, goal in the last (reference :179-182).
        agent_pos = place_obj_pos(
            keys[-4], grid, top=tops[0], size=(sizes[0, 0], sizes[0, 1])
        )
        agent_dir = rand_dir(keys[-3])
        last = count - 1
        goal_mask = g.free_mask(grid, agent_pos) & g.rect_mask(
            w, h, tops[last, 0], tops[last, 1], sizes[last, 0], sizes[last, 1]
        )
        goal_pos = sample_mask_cell(keys[-2], goal_mask)
        grid = g.set_cell(grid, goal_pos[0], goal_pos[1], GOAL_CELL)

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=keys[-1],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION),
        )

    def mission_text(self, mission=None) -> str:
        return "traverse the rooms to get to the goal"

"""BabyAI level base (reference: minigrid/envs/babyai/core/roomgrid_level.py).

A level's ``gen_attempt(key) -> (RoomGridState, InstrState, valid)`` plays the
role of ``gen_mission``; the base class wraps it in the reference's
rejection-resampling loop (roomgrid_level.py:118-139) as a bounded
``while_loop`` re-drawing keys, runs the shared instruction validation
(:145-198), recomputes the dynamic step limit (:70-84), and drives the
verifier state machine in ``_post_step`` (:86-103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.constants import (
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_KEY,
    OBJ_WALL,
    STATE_LOCKED,
    cell_color,
    cell_state,
    cell_type,
)
from minigrid_tpu.core.env import success_reward
from minigrid_tpu.core.roomgrid import RoomGridState
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.envs.babyai.core.instr import (
    LEAF_PUTNEXT,
    S_FAILURE,
    S_SUCCESS,
    InstrState,
    num_navs,
    tracked_plane,
    verify_step,
)
from minigrid_tpu.envs.babyai.core.text import encode_babyai_mission, babyai_mission_text
from minigrid_tpu.envs.unlock import RoomGridEnvBase
from minigrid_tpu.utils.tree_gather import compact_valid_indices, tree_take


def _rev32(x):
    """Bitwise reversal of uint32 words (5 masked swaps)."""
    x = ((x & jnp.uint32(0x55555555)) << 1) | ((x >> 1) & jnp.uint32(0x55555555))
    x = ((x & jnp.uint32(0x33333333)) << 2) | ((x >> 2) & jnp.uint32(0x33333333))
    x = ((x & jnp.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & jnp.uint32(0x0F0F0F0F))
    x = ((x & jnp.uint32(0x00FF00FF)) << 8) | ((x >> 8) & jnp.uint32(0x00FF00FF))
    return (x << 16) | (x >> 16)


def _dilate4(m):
    p = jnp.pad(m, 1)
    return p[2:, 1:-1] | p[:-2, 1:-1] | p[1:-1, 2:] | p[1:-1, :-2]


class RoomGridLevel(RoomGridEnvBase):
    """Base for BabyAI levels."""

    # Level-family flags (reference levels set these as attributes).
    unblocking = False

    # Pool over-provision for batch_reset_cache: pool = factor * levels
    # needed.  Families with high attempt-validity override this downward
    # (measured rates: GoToLocal/GoToRedBall* ~0.84 -> 1.3, PutNextLocal
    # ~0.75 -> 1.5, Synth ~0.91, GoTo/Pickup ~0.52) so generation work
    # shrinks while the shortfall-wraparound probability stays negligible —
    # factor*validity keeps >=10-sigma binomial headroom over 1.0 at >=2^14
    # pools, and a shortfall only wraps around to reuse valid levels.
    pool_factor = 2.0

    def __init__(
        self,
        room_size: int = 8,
        num_rows: int = 3,
        num_cols: int = 3,
        max_steps: int | None = None,
        max_gen_attempts: int = 200,
        **kwargs,
    ):
        self.fixed_max_steps = max_steps is not None
        super().__init__(
            room_size,
            num_rows,
            num_cols,
            max_steps if max_steps is not None else 0,
            **kwargs,
        )
        self.max_gen_attempts = max_gen_attempts

    # -- to be provided by level families ------------------------------------
    def gen_attempt(self, key: jax.Array):
        """One mission-generation attempt.

        Returns (RoomGridState, InstrState, valid: bool[]).  ``valid`` folds
        in any level-specific rejection conditions; the base adds the shared
        instruction validation.
        """
        raise NotImplementedError

    # -- shared validation (reference roomgrid_level.py:145-198) -------------
    def _validate(self, s: RoomGridState, instr: InstrState) -> jnp.ndarray:
        grid = s.grid
        # Placement feasibility: a full room makes the reference's place_obj
        # raise RecursionError, aborting the attempt (roomgrid_level.py:
        # 118-139); the builder accumulates that as s.ok.
        ok = jnp.asarray(s.ok)

        # PutNext checks (:159-176): descriptor sets must not intersect and
        # must not already be adjacent.
        for leaf in range(4):
            is_put = instr.leaf_kind[leaf] == LEAF_PUTNEXT
            move = tracked_plane(instr.gridm, leaf, 0)
            fixed = tracked_plane(instr.gridm, leaf, 1)
            intersects = (move & fixed).any()
            already_next = (_dilate4(fixed) & move).any()
            ok &= ~(is_put & (intersects | already_next))

        # Every active descriptor must match at least one object (the
        # reference asserts this when generating the surface string).
        for leaf in range(4):
            active = instr.leaf_kind[leaf] >= 0
            has0 = tracked_plane(instr.gridm, leaf, 0).any()
            is_put = instr.leaf_kind[leaf] == LEAF_PUTNEXT
            has1 = tracked_plane(instr.gridm, leaf, 1).any()
            ok &= ~active | (has0 & (~is_put | has1))

        if self.unblocking:
            # No instruction may reference a key whose color matches a locked
            # door (:149-191).
            t = cell_type(grid)
            locked_door = (t == OBJ_DOOR) & (cell_state(grid) == STATE_LOCKED)
            locked_colors = jnp.zeros((6,), bool)
            for c in range(6):
                locked_colors = locked_colors.at[c].set(
                    (locked_door & (cell_color(grid) == c)).any()
                )
            for leaf in range(4):
                for d in range(2):
                    refs_key = instr.d_type[leaf, d] == OBJ_KEY
                    col = jnp.clip(instr.d_color[leaf, d], 0, 5)
                    # color None (-1): any key color matching any locked door
                    # color would still pass the reference check (it compares
                    # the desc's color attribute, None != color strings).
                    bad = refs_key & (instr.d_color[leaf, d] >= 0) & locked_colors[col]
                    active = instr.leaf_kind[leaf] >= 0
                    ok &= ~(active & bad)
        return ok

    def check_objs_reachable(self, s: RoomGridState) -> jnp.ndarray:
        """All objects reachable without moving anything
        (reference roomgrid_level.py:249-301).

        Bit-packed flood fill: each grid row is one uint32 word (bit x =
        column x), the rightward in-row spread is the closed carry form
        ``m | (((m & open) + open) ^ open)`` (leftward via bit reversal),
        vertical spread is one shifted OR — a convergence-checked while_loop
        over full-lane [H]-word ops instead of (W*H)/2 whole-grid dilations.
        Exhaustively validated against the dilation BFS."""
        grid = s.grid
        w, h = grid.shape[:2]
        t = cell_type(grid)
        if w > 31:  # word path needs one bit per column
            passable = (t == OBJ_EMPTY) | (t == OBJ_DOOR)
            xs = jnp.arange(w)[:, None]
            ys = jnp.arange(h)[None, :]
            start = (xs == s.agent_pos[0]) & (ys == s.agent_pos[1])

            def body(_, reach):
                frontier = reach & (passable | start)
                return reach | _dilate4(frontier)

            reach = jax.lax.fori_loop(0, (w * h) // 2 + 2, body, start)
            objects = (t != OBJ_EMPTY) & (t != OBJ_WALL)
            return (~objects | reach).all()

        open_ = (t == OBJ_EMPTY) | (t == OBJ_DOOR)
        weights = jnp.uint32(1) << jnp.arange(w, dtype=jnp.uint32)
        ow = jnp.sum(jnp.where(open_, weights[:, None], jnp.uint32(0)), axis=0)
        owr = _rev32(ow) >> (32 - w)
        full = jnp.uint32((1 << w) - 1)
        seed = jnp.where(
            jnp.arange(h) == s.agent_pos[1],
            jnp.uint32(1) << s.agent_pos[0].astype(jnp.uint32),
            jnp.uint32(0),
        )

        def flood_r(m, tw):
            return m | ((((m & tw) + tw) & full) ^ tw)

        def body(carry):
            m, _ = carry
            m2 = flood_r(m, ow)
            mrev = _rev32(m2) >> (32 - w)
            m2 = m2 | (_rev32(flood_r(mrev, owr)) >> (32 - w))
            mo = m2 & ow
            up = jnp.concatenate([mo[1:], jnp.zeros((1,), jnp.uint32)])
            dn = jnp.concatenate([jnp.zeros((1,), jnp.uint32), mo[:-1]])
            m3 = m2 | up | dn
            return m3, (m3 != m).any()

        m, _ = jax.lax.while_loop(lambda c: c[1], body, (seed, jnp.asarray(True)))
        objects = (t != OBJ_EMPTY) & (t != OBJ_WALL)
        obj_w = jnp.sum(jnp.where(objects, weights[:, None], jnp.uint32(0)), axis=0)
        return (obj_w & ~m).sum() == 0

    # -- generation with rejection resampling ----------------------------------
    def _generate(self, key: jax.Array) -> EnvState:
        def attempt(k):
            s, instr, valid = self.gen_attempt(k)
            valid &= self._validate(s, instr)
            return s, instr, valid

        k0, kl = jax.random.split(key)
        s0, i0, v0 = attempt(k0)

        def cond(carry):
            _, _, valid, _, itr = carry
            return (~valid) & (itr < self.max_gen_attempts)

        def body(carry):
            s, instr, _, k, itr = carry
            k, ka = jax.random.split(k)
            s2, i2, v2 = attempt(ka)
            return s2, i2, v2, k, itr + 1

        s, instr, _, kl, _ = jax.lax.while_loop(
            cond, body, (s0, i0, v0, kl, jnp.int32(0))
        )
        return self._finish_level(s, instr, jax.random.fold_in(kl, 7))

    def _finish_level(self, s: RoomGridState, instr: InstrState, rng) -> EnvState:
        """Assemble the episode state from an accepted attempt: dynamic step
        limit (reference roomgrid_level.py:76-83) + mission encoding."""
        if self.fixed_max_steps:
            max_steps = jnp.int32(self.max_steps)
        else:
            nav_time_maze = (
                self.builder.room_size**2 * self.builder.num_rows * self.builder.num_cols
            )
            max_steps = num_navs(instr) * nav_time_maze

        mission = encode_babyai_mission(instr)
        return new_state(
            grid=s.grid,
            agent_pos=s.agent_pos,
            agent_dir=s.agent_dir,
            rng=rng,
            max_steps=max_steps,
            mission=mission,
            extra={"instr": instr},
        )

    def batch_reset_cache(self, key: jax.Array, num_envs: int, num_resets: int):
        """Pooled level generation for the amortized reset cache.

        The per-env generator pays the batched rejection-resampling tail:
        under ``vmap`` the retry while_loop iterates until EVERY env has a
        valid level, so all lanes pay ~E[max of N geometrics] attempts.
        Here one shared pool of 2x-over-provisioned SINGLE attempts is drawn
        (attempts are iid, so keeping the valid ones preserves exactly the
        rejection-sampled level distribution) and compacted into the cache;
        under-provision wraps around to reuse valid levels (probability
        ~exp(-N) at 2x for ~50%-validity families).
        """
        from minigrid_tpu.utils.chunked import chunked_vmap, lane_cap

        total = num_envs * num_resets
        pool = int(total * self.pool_factor)
        k_pool, k_fin = jax.random.split(key)
        cap = lane_cap(self.width * self.height)

        def attempt(k):
            s, instr, valid = self.gen_attempt(k)
            valid &= self._validate(s, instr)
            return s, instr, valid

        s, instr, valid = chunked_vmap(
            attempt, jax.random.split(k_pool, pool), cap
        )
        idx = compact_valid_indices(valid, total)  # valid-first, wrapping
        s, instr = tree_take((s, instr), idx)
        states = chunked_vmap(
            lambda t: self._finish_level(*t),
            (s, instr, jax.random.split(k_fin, total)),
            cap,
        )
        return jax.tree.map(
            lambda a: a.reshape((num_envs, num_resets) + a.shape[1:]), states
        )

    # -- verifier hook -----------------------------------------------------------
    def _post_step(self, prev_state, state, action, reward):
        instr, status = verify_step(
            state.extra["instr"], prev_state, state, action
        )
        reward = jnp.where(status == S_SUCCESS, success_reward(state), reward)
        reward = jnp.where(status == S_FAILURE, 0.0, reward)
        terminated = state.terminated | (status != 0)
        return (
            state.replace(terminated=terminated, extra={"instr": instr}),
            reward,
        )

    def mission_text(self, mission) -> str:
        return babyai_mission_text(mission)


# All RoomGridLevel families run inside the fused whole-rollout kernel via
# the block-layout verifier twin (instr_block.py); equivalence vs the XLA
# step_cached path is enforced per family in tests/test_fused_rollout.py.
from minigrid_tpu.envs.babyai.core.instr_block import BabyAIFusedExt  # noqa: E402

RoomGridLevel.fused_ext = BabyAIFusedExt()

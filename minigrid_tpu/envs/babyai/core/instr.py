"""Device-side BabyAI instruction encoding + verifier.

The reference verifier is an object graph of ``Instr`` subclasses holding
Python sets of object identities (reference: minigrid/envs/babyai/core/
verifier.py:49-566).  Here an instruction is a fixed-slot pytree:

* at most 4 leaf action instructions (slots a1, a2, b1, b2), covering every
  shape the grammar produces — Action, And(a1,a2), Before/After(x, y) with
  x/y either Action or And;
* each leaf has up to 2 object descriptors (PutNext uses both);
* object identity tracking (the reference's ``obj_set``/``obj_poss``,
  verifier.py:104-169) becomes per-descriptor cell masks BIT-PACKED into one
  int32[W, H] plane each (bit ``leaf*2 + slot``): ``gridm`` marks cells
  currently holding a tracked object, ``poss`` is the verifier-visible
  position set (updated only on drop actions, mirroring
  roomgrid_level.py:89-91), and ``carried`` flags a tracked object in hand.
  Packing all 8 (leaf, slot) masks into one plane makes every per-step
  bookkeeping op (pickup/drop/box updates, forward-cell membership, the
  PutNext dilation — OR distributes over bits) a single int32 plane op
  instead of eight boolean-plane ops, and shrinks the verifier state that
  rides through every auto-reset blend and reset cache by 8 planes -> 2.

Statuses: 0 continue, 1 success, 2 failure.

Done-actions mode (reference verifier.py:25, env flag ``BABYAI_DONE_ACTIONS``):
when enabled, leaf ``verify`` swallows every status on non-``done`` actions and
only records whether the action just satisfied the instruction
(``lastStepMatch``, verifier.py:225-237); a ``done`` action then returns
success/failure from that memory.  The flag is read from the environment when
an instruction is created (``empty_instr``).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import (
    DIR_TO_VEC,
    OBJ_BOX,
    OBJ_DOOR,
    STATE_OPEN,
    carry_type,
    cell_color,
    cell_state,
    cell_type,
)

_DX = jnp.array([1, 0, -1, 0], dtype=jnp.int32)
_DY = jnp.array([0, 1, 0, -1], dtype=jnp.int32)

# Leaf kinds
LEAF_NONE = -1
LEAF_OPEN = 0
LEAF_GOTO = 1
LEAF_PICKUP = 2
LEAF_PUTNEXT = 3

# Top-level structure kinds
TOP_ACTION = 0
TOP_AND = 1
TOP_BEFORE = 2
TOP_AFTER = 3

S_CONTINUE = 0
S_SUCCESS = 1
S_FAILURE = 2

# Location vocabulary (reference verifier.py:21)
LOC_LEFT, LOC_RIGHT, LOC_FRONT, LOC_BEHIND = 0, 1, 2, 3


def use_done_actions() -> bool:
    """Whether the verifier runs in done-actions mode (reference
    verifier.py:25 reads ``BABYAI_DONE_ACTIONS`` at import; we read it at
    instruction-creation time so tests can toggle it per env instance)."""
    return bool(os.environ.get("BABYAI_DONE_ACTIONS", False))


@struct.dataclass
class InstrState:
    # -- static description (per episode) --
    top_kind: jnp.ndarray  # i32[]
    a_is_and: jnp.ndarray  # bool[]
    b_is_and: jnp.ndarray  # bool[]
    strict: jnp.ndarray  # bool[] (seq-level strict)
    leaf_kind: jnp.ndarray  # i32[4]
    leaf_strict: jnp.ndarray  # bool[4]
    d_type: jnp.ndarray  # i32[4, 2] (-1 none)
    d_color: jnp.ndarray  # i32[4, 2] (-1 none)
    d_loc: jnp.ndarray  # i32[4, 2] (-1 none)
    d_plural: jnp.ndarray  # bool[4, 2] (|obj_set| > 1 at reset, for surface text)
    # -- tracking state (bit ``leaf*2 + slot`` of each int32 cell) --
    poss: jnp.ndarray  # i32[W, H] packed
    gridm: jnp.ndarray  # i32[W, H] packed
    carried: jnp.ndarray  # bool[4, 2]
    # -- per-leaf verifier memory (the reference's preCarrying, updated only
    #    when the leaf's verify is *called*) --
    pre_none: jnp.ndarray  # bool[4]
    pre_move_tracked: jnp.ndarray  # bool[4]
    # -- done-actions mode (reference verifier.py:25,219-237) --
    done_mode: jnp.ndarray  # bool[]
    last_match: jnp.ndarray  # bool[4] (per-leaf lastStepMatch)
    # -- combinator state --
    a_succ: jnp.ndarray  # bool[]
    b_succ: jnp.ndarray  # bool[]
    sub_succ: jnp.ndarray  # bool[4] (sticky per-leaf success inside And sides)


def empty_instr(width: int, height: int, done_mode: bool | None = None) -> InstrState:
    if done_mode is None:
        done_mode = use_done_actions()
    return InstrState(
        top_kind=jnp.int32(TOP_ACTION),
        a_is_and=jnp.asarray(False),
        b_is_and=jnp.asarray(False),
        strict=jnp.asarray(False),
        leaf_kind=jnp.full((4,), LEAF_NONE, jnp.int32),
        leaf_strict=jnp.zeros((4,), bool),
        d_type=jnp.full((4, 2), -1, jnp.int32),
        d_color=jnp.full((4, 2), -1, jnp.int32),
        d_loc=jnp.full((4, 2), -1, jnp.int32),
        d_plural=jnp.zeros((4, 2), bool),
        poss=jnp.zeros((width, height), jnp.int32),
        gridm=jnp.zeros((width, height), jnp.int32),
        carried=jnp.zeros((4, 2), bool),
        pre_none=jnp.ones((4,), bool),
        pre_move_tracked=jnp.zeros((4,), bool),
        done_mode=jnp.asarray(bool(done_mode)),
        last_match=jnp.zeros((4,), bool),
        a_succ=jnp.asarray(False),
        b_succ=jnp.asarray(False),
        sub_succ=jnp.zeros((4,), bool),
    )


_BIT = jnp.arange(4, dtype=jnp.int32)[:, None] * 2 + jnp.arange(2, dtype=jnp.int32)


def unpack_slots(bits) -> jnp.ndarray:
    """int32 scalar (or [...]-shaped) packed slot bits -> bool[..., 4, 2]."""
    b = jnp.asarray(bits, jnp.int32)
    return ((b[..., None, None] >> _BIT) & 1) != 0


def pack_slots(flags: jnp.ndarray) -> jnp.ndarray:
    """bool[..., 4, 2] -> packed int32[...]."""
    return jnp.sum(
        jnp.where(flags, jnp.int32(1) << _BIT, 0), axis=(-2, -1)
    ).astype(jnp.int32)


def tracked_plane(bits: jnp.ndarray, leaf: int, d: int) -> jnp.ndarray:
    """bool[W, H] mask of slot (leaf, d) from a packed plane."""
    return ((bits >> (leaf * 2 + d)) & 1) != 0


def desc_match_mask(
    grid: jnp.ndarray,
    d_type,
    d_color,
    d_loc,
    agent_pos,
    agent_dir,
    agent_room_mask: jnp.ndarray | None,
) -> jnp.ndarray:
    """Initial ``find_matching_objs`` (reference verifier.py:104-169): cells
    whose object matches (type, color) and, if a location is given, the
    direction predicate relative to the agent's start pose, restricted to the
    agent's start room."""
    w, h = grid.shape[:2]
    t = cell_type(grid).astype(jnp.int32)
    c = cell_color(grid).astype(jnp.int32)
    # The reference iterates every non-None cell (verifier.py:120-124);
    # level grammars only ever describe box/ball/key/door, but we keep the
    # same candidate set for faithfulness.
    m = t >= 2
    m = m & jnp.where(d_type >= 0, t == d_type, True)
    m = m & jnp.where(d_color >= 0, c == d_color, True)

    xs = jnp.arange(w)[:, None]
    ys = jnp.arange(h)[None, :]
    vx = xs - agent_pos[0]
    vy = ys - agent_pos[1]
    d1 = DIR_TO_VEC[agent_dir]
    # d2 = right vector basis used by the reference (verifier.py:150-152)
    d2x, d2y = -d1[1], d1[0]
    dot1 = vx * d1[0] + vy * d1[1]
    dot2 = vx * d2x + vy * d2y
    loc_ok = jnp.where(
        d_loc == LOC_LEFT, dot2 < 0,
        jnp.where(
            d_loc == LOC_RIGHT, dot2 > 0,
            jnp.where(d_loc == LOC_FRONT, dot1 > 0, dot1 < 0),
        ),
    )
    if agent_room_mask is not None:
        loc_ok = loc_ok & agent_room_mask
    m = m & jnp.where(d_loc >= 0, loc_ok, True)
    return m


def _dilate4(m: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.pad(m, ((1, 1), (1, 1)))[2:, 1:-1]
        | jnp.pad(m, ((1, 1), (1, 1)))[:-2, 1:-1]
        | jnp.pad(m, ((1, 1), (1, 1)))[1:-1, 2:]
        | jnp.pad(m, ((1, 1), (1, 1)))[1:-1, :-2]
    )


def _fwd_mask(state):
    """One-hot bool[W, H] of the (clipped) cell in front of the agent —
    mask-based reads/writes instead of dynamic indexing (TPU gathers cost
    ~5x a fused one-hot reduce at rollout batch sizes, tools/perf_probe.py)."""
    w, h = state.grid.shape[:2]
    fx = jnp.clip(state.agent_x + _DX[state.agent_dir], 0, w - 1)
    fy = jnp.clip(state.agent_y + _DY[state.agent_dir], 0, h - 1)
    xs = jnp.arange(w, dtype=jnp.int32)[:, None]
    ys = jnp.arange(h, dtype=jnp.int32)[None, :]
    return (xs == fx) & (ys == fy)


def _leaf_statuses(instr: InstrState, prev_state, state, action, fmask_prev):
    """Candidate status of each leaf given its stored memory (pure)."""
    a = jnp.asarray(action, jnp.int32)
    fmask_now = _fwd_mask(state)
    fcell_now = jnp.max(jnp.where(fmask_now, state.grid, 0))
    fnow_type = cell_type(fcell_now)
    fnow_state = cell_state(fcell_now)
    carrying_now = carry_type(state.carrying) != 0
    dropped = (carry_type(prev_state.carrying) != 0) & ~carrying_now

    # Packed planes: the forward cell's slot membership is ONE masked
    # max-reduce per plane, unpacked to [4, 2] flags.
    at_fwd_prev = unpack_slots(jnp.max(jnp.where(fmask_prev, instr.gridm, 0)))
    poss_at_now = unpack_slots(jnp.max(jnp.where(fmask_now, instr.poss, 0)))
    # PutNext's "next to a tracked fixed position": 4-dilation distributes
    # over the packed bits (it is an OR of shifted planes).
    near_bits = unpack_slots(jnp.max(jnp.where(fmask_now, _dilate4(instr.poss), 0)))

    statuses = []
    for leaf in range(4):
        kind = instr.leaf_kind[leaf]
        strict = instr.leaf_strict[leaf]
        # OPEN (verifier.py:268-285): toggle onto a tracked, now-open door.
        open_succ = (
            (a == Actions.toggle)
            & at_fwd_prev[leaf, 0]
            & (fnow_type == OBJ_DOOR)
            & (fnow_state == STATE_OPEN)
        )
        open_fail = (
            strict & (a == Actions.toggle) & (fnow_type == OBJ_DOOR) & ~open_succ
        )
        # GOTO (verifier.py:307-314): facing a tracked position.
        goto_succ = poss_at_now[leaf, 0]
        # PICKUP (verifier.py:341-361).
        pickup_succ = (
            (a == Actions.pickup) & instr.pre_none[leaf] & instr.carried[leaf, 0]
        )
        pickup_fail = strict & (a == Actions.pickup) & carrying_now & ~pickup_succ
        # PUTNEXT (verifier.py:409-433): successful drop of a tracked move
        # object next to a tracked fixed position (poss updated pre-verify).
        near_fixed = near_bits[leaf, 1]
        put_succ = (
            (a == Actions.drop) & dropped & instr.pre_move_tracked[leaf] & near_fixed
        )
        put_fail = strict & (a == Actions.pickup) & carrying_now

        succ = jnp.where(
            kind == LEAF_OPEN, open_succ,
            jnp.where(
                kind == LEAF_GOTO, goto_succ,
                jnp.where(kind == LEAF_PICKUP, pickup_succ, put_succ),
            ),
        )
        fail = jnp.where(
            kind == LEAF_OPEN, open_fail,
            jnp.where(
                kind == LEAF_GOTO, False,
                jnp.where(kind == LEAF_PICKUP, pickup_fail, put_fail),
            ),
        ) & ~succ
        status = jnp.where(succ, S_SUCCESS, jnp.where(fail, S_FAILURE, S_CONTINUE))
        statuses.append(jnp.where(kind == LEAF_NONE, S_CONTINUE, status))
    return jnp.stack(statuses)


def _side_status(instr, leaf_status, side_is_and, i0, i1, side_succ_prior):
    """Status of one seq side (a leaf or an And of two leaves).

    For an And, leaf stickies gate which leaves are 'called'; failures are
    swallowed (reference AndInstr.verify, verifier.py:552-566).  NOTE the
    reference has a done-actions branch failing the And when both sides fail
    (verifier.py:554-556), but it is gated on ``action is env.actions.done``
    — an *identity* comparison that is False whenever the action arrives as
    an int/numpy scalar through the standard gym interface, i.e. dead code
    on the supported call path.  We mirror the live (int-action) semantics:
    an And never fails on a done action; only single-leaf seq sides do."""
    s0 = jnp.where(instr.sub_succ[i0], S_SUCCESS, leaf_status[i0])
    s1 = jnp.where(instr.sub_succ[i1], S_SUCCESS, leaf_status[i1])
    and_status = jnp.where(
        (s0 == S_SUCCESS) & (s1 == S_SUCCESS), S_SUCCESS, S_CONTINUE
    )
    single = jnp.where(side_succ_prior, S_SUCCESS, leaf_status[i0])
    return jnp.where(side_is_and, and_status, single)


def verify_step(instr: InstrState, prev_state, state, action):
    """Run bookkeeping + one verifier tick.

    Mirrors RoomGridLevel.step (roomgrid_level.py:86-103): object-position
    bookkeeping, poss refresh on drop, then the instruction state machine.
    Returns (instr', status) with status in {continue, success, failure}.
    """
    a = jnp.asarray(action, jnp.int32)
    fmask_prev = _fwd_mask(prev_state)  # [W, H]

    picked = (carry_type(prev_state.carrying) == 0) & (carry_type(state.carrying) != 0)
    dropped = (carry_type(prev_state.carrying) != 0) & (carry_type(state.carrying) == 0)
    prev_fcell = jnp.max(jnp.where(fmask_prev, prev_state.grid, 0))
    now_fcell = jnp.max(jnp.where(fmask_prev, state.grid, 0))
    box_consumed = (
        (a == Actions.toggle)
        & (cell_type(prev_fcell) == OBJ_BOX)
        & (cell_type(now_fcell) != OBJ_BOX)
    )

    gridm = instr.gridm
    carried = instr.carried
    at_fwd = unpack_slots(jnp.max(jnp.where(fmask_prev, gridm, 0)))  # [4, 2]
    # pickup: a tracked object leaves the grid into the hand.
    carried = jnp.where(picked, carried | at_fwd, carried)
    gridm = jnp.where(picked & fmask_prev, 0, gridm)
    # drop: the held tracked object reappears at fwd.
    gridm = jnp.where(dropped & fmask_prev, gridm | pack_slots(carried), gridm)
    carried = jnp.where(dropped, jnp.zeros_like(carried), carried)
    # box reveal destroys the tracked box object (contents are new objects).
    gridm = jnp.where(box_consumed & fmask_prev, 0, gridm)

    # update_objs_poss on drop ACTION (roomgrid_level.py:89-91) — refreshes
    # obj_poss to the tracked objects currently in the grid.
    poss = jnp.where(a == Actions.drop, gridm, instr.poss)

    instr = instr.replace(gridm=gridm, carried=carried, poss=poss)

    raw_status = _leaf_statuses(instr, prev_state, state, action, fmask_prev)

    # Done-actions mode (verifier.py:225-237): ActionInstr.verify swallows
    # verify_action's result on non-done actions (returns None, recording
    # lastStepMatch); a done action reports success/failure from that memory.
    is_done_act = instr.done_mode & (a == Actions.done)
    done_leaf = jnp.where(instr.last_match, S_SUCCESS, S_FAILURE)
    leaf_status = jnp.where(
        instr.done_mode,
        jnp.where(is_done_act, done_leaf, S_CONTINUE),
        raw_status,
    )

    top = instr.top_kind
    # -- which leaves does the reference call this step? --
    a_prior = instr.a_succ
    b_prior = instr.b_succ
    a_status = _side_status(instr, leaf_status, instr.a_is_and, 0, 1, a_prior)
    b_status = _side_status(instr, leaf_status, instr.b_is_and, 2, 3, b_prior)

    is_action = top == TOP_ACTION
    is_and = top == TOP_AND
    is_before = top == TOP_BEFORE
    is_after = top == TOP_AFTER

    # BEFORE (verifier.py:465-487): a first; on a's success the same action
    # also drives b (the recursive re-verify).
    bef_status = jnp.where(
        a_prior | (a_status == S_SUCCESS),
        jnp.where(
            b_status == S_FAILURE, S_FAILURE,
            jnp.where(b_status == S_SUCCESS, S_SUCCESS, S_CONTINUE),
        ),
        jnp.where(
            a_status == S_FAILURE,
            S_FAILURE,
            jnp.where(instr.strict & (b_status == S_SUCCESS), S_FAILURE, S_CONTINUE),
        ),
    )
    aft_status = jnp.where(
        b_prior | (b_status == S_SUCCESS),
        jnp.where(
            a_status == S_FAILURE, S_FAILURE,
            jnp.where(a_status == S_SUCCESS, S_SUCCESS, S_CONTINUE),
        ),
        jnp.where(
            b_status == S_FAILURE,
            S_FAILURE,
            jnp.where(instr.strict & (a_status == S_SUCCESS), S_FAILURE, S_CONTINUE),
        ),
    )
    # TOP_AND uses slots 0/1 as its two ActionInstrs.
    top_and_status = _side_status(
        instr, leaf_status, jnp.asarray(True), 0, 1, jnp.asarray(False)
    )
    single_status = leaf_status[0]

    status = jnp.where(
        is_action, single_status,
        jnp.where(is_and, top_and_status, jnp.where(is_before, bef_status, aft_status)),
    )

    # -- called mask (gates per-leaf memory + sticky updates) --
    a_called = jnp.where(
        is_action | is_and, True,
        jnp.where(is_before, ~a_prior, b_prior | (b_status == S_SUCCESS) | instr.strict),
    )
    b_called = jnp.where(
        is_action, False,
        jnp.where(
            is_and, True,
            jnp.where(
                is_before,
                a_prior | (a_status == S_SUCCESS) | instr.strict,
                ~b_prior,
            ),
        ),
    )
    called = jnp.stack(
        [
            a_called & ~instr.sub_succ[0],
            a_called & instr.a_is_and & ~instr.sub_succ[1],
            b_called & ~instr.sub_succ[2],
            b_called & instr.b_is_and & ~instr.sub_succ[3],
        ]
    )
    # Non-And sides have no per-leaf sticky in the reference (the side status
    # itself is sticky via a_succ/b_succ); calling is still gated identically.

    # Per-leaf memory updates where called (verifier.py:343-344, :411-412).
    # In done-actions mode a done action never reaches verify_action
    # (verifier.py:230-233), so neither preCarrying nor lastStepMatch moves.
    mem_update = called & ~is_done_act
    carrying_now_none = carry_type(state.carrying) == 0
    pre_none = jnp.where(mem_update, carrying_now_none, instr.pre_none)
    pre_move_tracked = jnp.where(mem_update, instr.carried[:, 0], instr.pre_move_tracked)
    last_match = jnp.where(
        instr.done_mode & mem_update, raw_status == S_SUCCESS, instr.last_match
    )

    sub_succ = instr.sub_succ | (called & (leaf_status == S_SUCCESS))
    # Side successes latch ONLY when that side is actually being driven: the
    # reference never stores the second stage's result before the first
    # completes (Before/After verify, verifier.py:465-487/:505-527 — the
    # strict-mode peek at the other side is checked and discarded).
    a_live = is_before | (is_after & (b_prior | (b_status == S_SUCCESS)))
    b_live = is_after | (is_before & (a_prior | (a_status == S_SUCCESS)))
    a_succ = instr.a_succ | (a_live & (a_status == S_SUCCESS))
    b_succ = instr.b_succ | (b_live & (b_status == S_SUCCESS))

    instr = instr.replace(
        pre_none=pre_none,
        pre_move_tracked=pre_move_tracked,
        last_match=last_match,
        sub_succ=sub_succ,
        a_succ=a_succ,
        b_succ=b_succ,
    )
    return instr, status


# -- construction helpers (used by level gen_attempt functions) ---------------


def set_leaf(instr: InstrState, leaf: int, kind, strict=False) -> InstrState:
    return instr.replace(
        leaf_kind=instr.leaf_kind.at[leaf].set(jnp.asarray(kind, jnp.int32)),
        leaf_strict=instr.leaf_strict.at[leaf].set(jnp.asarray(strict)),
    )


def set_desc(
    instr: InstrState,
    leaf: int,
    d: int,
    grid: jnp.ndarray,
    agent_pos,
    agent_dir,
    d_type,
    d_color=-1,
    d_loc=-1,
    agent_room_mask: jnp.ndarray | None = None,
) -> InstrState:
    """Attach descriptor (type, color, loc) to slot (leaf, d) and resolve its
    matching-object masks against the finished grid (the reference's
    reset_verifier + find_matching_objs)."""
    d_type = jnp.asarray(d_type, jnp.int32)
    d_color = jnp.asarray(d_color, jnp.int32)
    d_loc = jnp.asarray(d_loc, jnp.int32)
    mask = desc_match_mask(
        grid, d_type, d_color, d_loc, agent_pos, agent_dir, agent_room_mask
    )
    bit = jnp.int32(1) << (leaf * 2 + d)
    packed = jnp.where(mask, bit, 0)
    return instr.replace(
        d_type=instr.d_type.at[leaf, d].set(d_type),
        d_color=instr.d_color.at[leaf, d].set(d_color),
        d_loc=instr.d_loc.at[leaf, d].set(d_loc),
        d_plural=instr.d_plural.at[leaf, d].set(mask.sum() > 1),
        gridm=(instr.gridm & ~bit) | packed,
        poss=(instr.poss & ~bit) | packed,
    )


def set_top(instr: InstrState, kind, a_is_and=False, b_is_and=False, strict=False) -> InstrState:
    # Convention: TOP_AND stores its two ActionInstrs in slots 0/1 with
    # a_is_and=True so the called-mask gating covers both.
    kind = jnp.asarray(kind, jnp.int32)
    a_is_and = jnp.asarray(a_is_and) | (kind == TOP_AND)
    return instr.replace(
        top_kind=kind,
        a_is_and=a_is_and,
        b_is_and=jnp.asarray(b_is_and),
        strict=jnp.asarray(strict),
    )


def start_carrying_object(instr: InstrState, pos) -> InstrState:
    """Mark the object at ``pos`` as moved from the grid into the agent's
    hand before the episode starts (PutNext ``start_carrying``,
    reference putnext.py:190-200: matching ran with the object in the grid,
    then it was lifted; obj_poss stays stale)."""
    at = unpack_slots(instr.gridm[pos[0], pos[1]])
    return instr.replace(
        carried=instr.carried | at,
        gridm=instr.gridm.at[pos[0], pos[1]].set(0),
    )


def num_navs(instr: InstrState) -> jnp.ndarray:
    """Navigation count for the dynamic step limit
    (reference roomgrid_level.py:215-235): putnext counts 2, other leaves 1."""
    active = instr.leaf_kind >= 0
    per_leaf = jnp.where(instr.leaf_kind == LEAF_PUTNEXT, 2, 1)
    return (per_leaf * active).sum()

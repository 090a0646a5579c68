"""Branchless core transition.

Reproduces the action semantics of reference ``MiniGridEnv.step``
(minigrid/minigrid_env.py:525-595) as a single pure function: every action
branch becomes a predicated update, the one mutated grid cell is written with
an iota-mask blend, and reward/termination follow the reference contract
(goal => terminated + 1 - 0.9*step_count/max_steps, lava => terminated + 0,
truncated at step_count >= max_steps independent of termination).

Deviation from the reference: unknown action values are no-ops instead of
raising (data-dependent raises are impossible under jit); action values are
expected in [0, 7).
"""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import (
    CAN_PICKUP,
    DIR_TO_VEC,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_GOAL,
    OBJ_KEY,
    OBJ_LAVA,
    STATE_LOCKED,
    STATE_OPEN,
    can_overlap,
)
from minigrid_tpu.core.state import EnvState


def core_step(state: EnvState, action) -> tuple[EnvState, jnp.ndarray]:
    """Apply one action; returns (new_state, reward).

    ``state.terminated``/``state.truncated`` are set on the returned state.
    """
    width, height = state.grid.shape[:2]
    action = jnp.asarray(action, jnp.int32)
    step_count = state.step_count + 1

    # Forward cell, computed from the pre-action direction
    # (reference: minigrid/minigrid_env.py:534-538).
    fwd = state.agent_pos + DIR_TO_VEC[state.agent_dir]
    fx = jnp.clip(fwd[0], 0, width - 1)
    fy = jnp.clip(fwd[1], 0, height - 1)
    flat = fx * height + fy
    fcell = state.grid.reshape(width * height, 3)[flat]
    ftype, fcolor, fstate = fcell[0], fcell[1], fcell[2]
    fcontains = state.contains.reshape(width * height, 2)[flat]

    is_left = action == Actions.left
    is_right = action == Actions.right
    is_fwd = action == Actions.forward
    is_pickup = action == Actions.pickup
    is_drop = action == Actions.drop
    is_toggle = action == Actions.toggle

    # -- Rotation (reference: :541-548) --
    agent_dir = jnp.where(
        is_left,
        (state.agent_dir + 3) % 4,
        jnp.where(is_right, (state.agent_dir + 1) % 4, state.agent_dir),
    )

    # -- Forward movement (reference: :551-558) --
    moves = is_fwd & can_overlap(ftype, fstate)
    agent_pos = jnp.where(moves, fwd, state.agent_pos)
    hit_goal = is_fwd & (ftype == OBJ_GOAL)
    hit_lava = is_fwd & (ftype == OBJ_LAVA)
    terminated = hit_goal | hit_lava
    reward = jnp.where(
        hit_goal,
        1.0 - 0.9 * (step_count.astype(jnp.float32) / state.max_steps.astype(jnp.float32)),
        0.0,
    )

    # -- Pickup (reference: :561-566) --
    hands_free = state.carrying[0] == 0
    do_pickup = is_pickup & CAN_PICKUP[ftype] & hands_free & (ftype != OBJ_EMPTY)
    # -- Drop (reference: :569-573) --
    do_drop = is_drop & (ftype == OBJ_EMPTY) & ~hands_free
    # -- Toggle (reference: :576-578; door logic
    #    minigrid/core/world_object.py:185-195; box minigrid/core/world_object.py:291-294) --
    is_door = ftype == OBJ_DOOR
    is_box = ftype == OBJ_BOX
    has_matching_key = (state.carrying[0] == OBJ_KEY) & (state.carrying[1] == fcolor)
    door_new_state = jnp.where(
        fstate == STATE_LOCKED,
        jnp.where(has_matching_key, STATE_OPEN, STATE_LOCKED),
        # open -> closed, closed -> open
        jnp.where(fstate == STATE_OPEN, 1, 0),
    ).astype(jnp.uint8)
    do_toggle_door = is_toggle & is_door
    do_toggle_box = is_toggle & is_box

    # -- Compose the new forward-cell value (branches are mutually exclusive) --
    empty_cell = jnp.array([OBJ_EMPTY, 0, 0], dtype=jnp.uint8)
    drop_cell = jnp.stack(
        [state.carrying[0], state.carrying[1], jnp.zeros((), jnp.uint8)]
    )
    door_cell = jnp.stack([ftype, fcolor, door_new_state])
    box_reveal_cell = jnp.where(
        fcontains[0] == 0,
        empty_cell,
        jnp.stack([fcontains[0], fcontains[1], jnp.zeros((), jnp.uint8)]),
    )
    new_fcell = fcell
    new_fcell = jnp.where(do_pickup, empty_cell, new_fcell)
    new_fcell = jnp.where(do_drop, drop_cell, new_fcell)
    new_fcell = jnp.where(do_toggle_door, door_cell, new_fcell)
    new_fcell = jnp.where(do_toggle_box, box_reveal_cell, new_fcell)

    new_fcontains = fcontains
    new_fcontains = jnp.where(do_pickup | do_toggle_box, jnp.zeros(2, jnp.uint8), new_fcontains)
    new_fcontains = jnp.where(do_drop, state.carrying[2:4], new_fcontains)

    write = do_pickup | do_drop | do_toggle_door | do_toggle_box
    xs = jnp.arange(width, dtype=jnp.int32)[:, None]
    ys = jnp.arange(height, dtype=jnp.int32)[None, :]
    cell_mask = ((xs == fx) & (ys == fy) & write)[:, :, None]
    grid = jnp.where(cell_mask, new_fcell, state.grid)
    contains = jnp.where(cell_mask, new_fcontains, state.contains)

    carrying = state.carrying
    carrying = jnp.where(
        do_pickup,
        jnp.stack([ftype, fcolor, fcontains[0], fcontains[1]]),
        carrying,
    )
    carrying = jnp.where(do_drop, jnp.zeros(4, jnp.uint8), carrying)

    truncated = step_count >= state.max_steps

    new_state = state.replace(
        grid=grid,
        contains=contains,
        agent_pos=agent_pos,
        agent_dir=agent_dir,
        carrying=carrying,
        step_count=step_count,
        terminated=terminated,
        truncated=truncated,
    )
    return new_state, reward

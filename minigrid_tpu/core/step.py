"""Branchless core transition.

Reproduces the action semantics of reference ``MiniGridEnv.step``
(minigrid/minigrid_env.py:525-595) as a single pure function: every action
branch becomes a predicated update over SCALAR per-env values, the forward
cell is read with a one-hot max-reduce and written with a one-hot blend
(TPU row-gathers are ~5x slower than the reduce at rollout batch sizes, and
small trailing dims force layout-conversion copies — tools/perf_probe.py).
Reward/termination follow the reference contract (goal => terminated +
1 - 0.9*step_count/max_steps, lava => terminated + 0, truncated at
step_count >= max_steps independent of termination).

Deviation from the reference: unknown action values are no-ops instead of
raising (data-dependent raises are impossible under jit); action values are
expected in [0, 7).
"""

from __future__ import annotations

import jax.numpy as jnp

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import (
    CAN_PICKUP,
    OBJ_BOX,
    OBJ_DOOR,
    OBJ_EMPTY,
    OBJ_GOAL,
    OBJ_KEY,
    OBJ_LAVA,
    STATE_LOCKED,
    STATE_OPEN,
    can_overlap,
    carry_color,
    carry_contents,
    carry_type,
    cell,
    pack_carry,
)
from minigrid_tpu.core.state import EnvState

# Direction tables as two scalar lookups (avoids an int32[2] gather; the
# reference's DIR_TO_VEC is minigrid/core/constants.py:49-58).
_DX = jnp.array([1, 0, -1, 0], dtype=jnp.int32)
_DY = jnp.array([0, 1, 0, -1], dtype=jnp.int32)


def core_step(state: EnvState, action) -> tuple[EnvState, jnp.ndarray]:
    """Apply one action; returns (new_state, reward).

    ``state.terminated``/``state.truncated`` are set on the returned state.
    """
    width, height = state.grid.shape[:2]
    action = jnp.asarray(action, jnp.int32)
    step_count = state.step_count + 1

    # Forward cell, computed from the pre-action direction
    # (reference: minigrid/minigrid_env.py:534-538).
    fx_raw = state.agent_x + _DX[state.agent_dir]
    fy_raw = state.agent_y + _DY[state.agent_dir]
    fx = jnp.clip(fx_raw, 0, width - 1)
    fy = jnp.clip(fy_raw, 0, height - 1)

    xs = jnp.arange(width, dtype=jnp.int32)[:, None]
    ys = jnp.arange(height, dtype=jnp.int32)[None, :]
    fmask = (xs == fx) & (ys == fy)
    fcell = jnp.max(jnp.where(fmask, state.grid, 0))
    fcont = jnp.max(jnp.where(fmask, state.contains, 0))
    ftype = fcell & 0xFF
    fcolor = (fcell >> 8) & 0xFF
    fstate = (fcell >> 16) & 0xFF

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
    agent_x = jnp.where(moves, fx, state.agent_x)
    agent_y = jnp.where(moves, fy, state.agent_y)
    hit_goal = is_fwd & (ftype == OBJ_GOAL)
    hit_lava = is_fwd & (ftype == OBJ_LAVA)
    terminated = hit_goal | hit_lava
    reward = jnp.where(
        hit_goal,
        1.0
        - 0.9 * (step_count.astype(jnp.float32) / state.max_steps.astype(jnp.float32)),
        0.0,
    )

    carry = state.carrying
    hands_free = carry == 0

    # -- Pickup (reference: :561-566) --
    do_pickup = is_pickup & CAN_PICKUP[ftype] & hands_free & (ftype != OBJ_EMPTY)
    # -- Drop (reference: :569-573) --
    do_drop = is_drop & (ftype == OBJ_EMPTY) & ~hands_free
    # -- Toggle (reference: :576-578; door logic
    #    minigrid/core/world_object.py:185-195; box minigrid/core/world_object.py:291-294) --
    is_door = ftype == OBJ_DOOR
    is_box = ftype == OBJ_BOX
    has_matching_key = (carry_type(carry) == OBJ_KEY) & (carry_color(carry) == fcolor)
    door_new_state = jnp.where(
        fstate == STATE_LOCKED,
        jnp.where(has_matching_key, STATE_OPEN, STATE_LOCKED),
        # open -> closed, closed -> open
        jnp.where(fstate == STATE_OPEN, 1, 0),
    )
    do_toggle_door = is_toggle & is_door
    do_toggle_box = is_toggle & is_box

    # -- Compose the new forward-cell value (branches are mutually exclusive) --
    drop_cell = cell(carry_type(carry), carry_color(carry))
    door_cell = (fcell & 0xFFFF) | (door_new_state << 16)
    box_reveal_cell = jnp.where(fcont == 0, cell(OBJ_EMPTY), fcont)
    new_fcell = fcell
    new_fcell = jnp.where(do_pickup, cell(OBJ_EMPTY), new_fcell)
    new_fcell = jnp.where(do_drop, drop_cell, new_fcell)
    new_fcell = jnp.where(do_toggle_door, door_cell, new_fcell)
    new_fcell = jnp.where(do_toggle_box, box_reveal_cell, new_fcell)

    new_fcont = fcont
    new_fcont = jnp.where(do_pickup | do_toggle_box, 0, new_fcont)
    new_fcont = jnp.where(do_drop, carry_contents(carry), new_fcont)

    write = do_pickup | do_drop | do_toggle_door | do_toggle_box
    wmask = fmask & write
    grid = jnp.where(wmask, new_fcell, state.grid)
    contains = jnp.where(wmask, new_fcont, state.contains)

    picked = pack_carry(ftype, fcolor) | (fcont << 16)
    carrying = jnp.where(do_pickup, picked, carry)
    carrying = jnp.where(do_drop, 0, carrying)

    truncated = step_count >= state.max_steps

    new_state = state.replace(
        grid=grid,
        contains=contains,
        agent_x=agent_x,
        agent_y=agent_y,
        agent_dir=agent_dir,
        carrying=carrying,
        step_count=step_count,
        terminated=terminated,
        truncated=truncated,
    )
    return new_state, reward

"""Unlock, UnlockPickup, BlockedUnlockPickup
(reference: minigrid/envs/unlock.py, unlockpickup.py, blockedunlockpickup.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import (
    OBJ_BALL,
    OBJ_BOX,
    OBJ_KEY,
    SORTED_COLOR_IDX,
    STATE_OPEN,
    carry_color,
    carry_type,
    cell,
    cell_state,
)
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.roomgrid import RoomGridBuilder
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx

_MISSION_OPEN = register_mission("open the door")
_MISSION_PICKUP = register_mission("pick up the {0} {1}", ("color", "type"))


class RoomGridEnvBase(MiniGridEnv):
    """Shared plumbing for envs built on the RoomGrid lattice."""

    expensive_reset = True

    def __init__(self, room_size: int, num_rows: int, num_cols: int, max_steps: int, **kwargs):
        builder = RoomGridBuilder(room_size, num_rows, num_cols)
        super().__init__(
            width=builder.width,
            height=builder.height,
            max_steps=max_steps,
            see_through_walls=False,
            **kwargs,
        )
        self.builder = builder


class UnlockEnv(RoomGridEnvBase):
    """Two rooms, locked door + matching key; toggling the door open succeeds
    (reference: minigrid/envs/unlock.py:76-97)."""

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = 8 * room_size**2
        super().__init__(room_size, 1, 2, max_steps, **kwargs)

    def _generate(self, key: jax.Array) -> EnvState:
        b = self.builder
        k_init, k_door, k_key, k_agent, k_carry = jax.random.split(key, 5)
        s = b.init(k_init)
        s, door_color, door_pos = b.add_door(k_door, s, 0, 0, 0, locked=True)
        s, _, _, _ = b.add_object(k_key, s, 0, 0, kind=OBJ_KEY, color=door_color)
        s = b.place_agent(k_agent, s, 0, 0)
        return new_state(
            grid=s.grid,
            agent_pos=s.agent_pos,
            agent_dir=s.agent_dir,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION_OPEN),
            extra={"door_pos": door_pos},
        )

    def _post_step(self, prev_state, state, action, reward):
        dp = state.extra["door_pos"]
        door_open = cell_state(g.get_cell(state.grid, dp[0], dp[1])) == STATE_OPEN
        success = (jnp.asarray(action, jnp.int32) == Actions.toggle) & door_open
        reward = jnp.where(success, success_reward(state), reward)
        return state.replace(terminated=state.terminated | success), reward

    def mission_text(self, mission=None) -> str:
        return "open the door"


class UnlockPickupEnv(RoomGridEnvBase):
    """Box behind a locked door; pick it up to succeed
    (reference: minigrid/envs/unlockpickup.py:60-110)."""

    blocked = False

    def __init__(self, max_steps: int | None = None, **kwargs):
        room_size = 6
        if max_steps is None:
            max_steps = (16 if self.blocked else 8) * room_size**2
        super().__init__(room_size, 1, 2, max_steps, **kwargs)

    def _generate(self, key: jax.Array) -> EnvState:
        b = self.builder
        k_box, k_door, k_ball, k_key, k_agent, k_carry = jax.random.split(key, 6)
        s = b.init(jax.random.fold_in(key, 99))
        s, _, box_color, _ = b.add_object(k_box, s, 1, 0, kind=OBJ_BOX)
        s, door_color, door_pos = b.add_door(k_door, s, 0, 0, 0, locked=True)
        if self.blocked:
            # Ball directly left of the door (reference blockedunlockpickup.py:98-100).
            ball_color = jnp.asarray(SORTED_COLOR_IDX)[randint(k_ball, 0, 6)]
            s = s.replace(
                grid=g.set_cell(
                    s.grid,
                    door_pos[0] - 1,
                    door_pos[1],
                    cell(jnp.asarray(OBJ_BALL, jnp.int32), ball_color),
                )
            )
        s, _, _, _ = b.add_object(k_key, s, 0, 0, kind=OBJ_KEY, color=door_color)
        s = b.place_agent(k_agent, s, 0, 0)
        return new_state(
            grid=s.grid,
            agent_pos=s.agent_pos,
            agent_dir=s.agent_dir,
            rng=k_carry,
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION_PICKUP, box_color.astype(jnp.int32), OBJ_BOX),
            extra={"target_color": box_color.astype(jnp.int32)},
        )

    def _post_step(self, prev_state, state, action, reward):
        success = (
            (jnp.asarray(action, jnp.int32) == Actions.pickup)
            & (carry_type(state.carrying) == OBJ_BOX)
            & (carry_color(state.carrying).astype(jnp.int32) == state.extra["target_color"])
        )
        reward = jnp.where(success, success_reward(state), reward)
        return state.replace(terminated=state.terminated | success), reward


class BlockedUnlockPickupEnv(UnlockPickupEnv):
    """UnlockPickup with a ball blocking the door
    (reference: minigrid/envs/blockedunlockpickup.py:66-120)."""

    blocked = True


class _UnlockFusedExt(fx.FusedExt):
    """Block twin of UnlockEnv._post_step: toggle with the tracked door open
    succeeds (door state read from the post grid)."""

    n_scalars = 2

    def pack_extra(self, env, extra):
        return jnp.asarray(extra["door_pos"], jnp.int32), None

    def unpack_extra(self, env, scal, planes):
        return {"door_pos": scal}

    def post_step(self, ctx):
        dcell = ctx.read_xy(ctx.g_post, ctx.scal[0], ctx.scal[1])
        door_open = fx.cell_state_bits(dcell) == STATE_OPEN
        success = (ctx.action == Actions.toggle) & door_open
        reward = jnp.where(success, ctx.success_reward(), ctx.reward)
        return success, reward, ctx.scal, ctx.planes


class _UnlockPickupFusedExt(fx.FusedExt):
    """Block twin of UnlockPickupEnv._post_step: pickup of the commanded-color
    box succeeds."""

    n_scalars = 1

    def pack_extra(self, env, extra):
        return extra["target_color"].astype(jnp.int32)[..., None], None

    def unpack_extra(self, env, scal, planes):
        return {"target_color": scal[..., 0]}

    def post_step(self, ctx):
        carry = ctx.sc[fx.ROW_CARRY]
        success = (
            (ctx.action == Actions.pickup)
            & (fx.carry_type(carry) == OBJ_BOX)
            & (fx.carry_color(carry) == ctx.scal[0])
        )
        reward = jnp.where(success, ctx.success_reward(), ctx.reward)
        return success, reward, ctx.scal, ctx.planes


UnlockEnv.fused_ext = _UnlockFusedExt()
UnlockPickupEnv.fused_ext = _UnlockPickupFusedExt()

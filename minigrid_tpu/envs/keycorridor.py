"""KeyCorridor (reference: minigrid/envs/keycorridor.py:8-137)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import OBJ_BALL, OBJ_KEY, carry_color, carry_type
from minigrid_tpu.core.env import success_reward
from minigrid_tpu.core.mission import mission_vec
from minigrid_tpu.core.sampling import randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.ops import fused_ext as fx
from minigrid_tpu.envs.unlock import RoomGridEnvBase, _MISSION_PICKUP


class KeyCorridorEnv(RoomGridEnvBase):
    """3-column room lattice with the middle column joined into a corridor;
    target object behind a locked door on the right, key on the left
    (reference: minigrid/envs/keycorridor.py:104-137)."""

    def __init__(
        self,
        room_size: int = 6,
        num_rows: int = 3,
        obj_type: str = "ball",
        max_steps: int | None = None,
        **kwargs,
    ):
        if max_steps is None:
            max_steps = 30 * room_size**2
        super().__init__(room_size, num_rows, 3, max_steps, **kwargs)
        self.obj_kind = {"ball": OBJ_BALL, "key": OBJ_KEY}[obj_type]

    def _generate(self, key: jax.Array) -> EnvState:
        b = self.builder
        keys = jax.random.split(key, 8)
        s = b.init(keys[0])

        # Join the middle column into a corridor (reference :106-108).
        for j in range(1, b.num_rows):
            s = b.remove_wall(s, 1, j, 3)

        # Locked door + target object in a random right-column room (:110-113).
        room_idx = randint(keys[1], 0, b.num_rows)
        s, door_color, _ = b.add_door(keys[2], s, 2, room_idx, 2, locked=True)
        s, _, obj_color, _ = b.add_object(keys[3], s, 2, room_idx, kind=self.obj_kind)

        # Key in a random left-column room (:116).
        s, _, _, _ = b.add_object(
            keys[4], s, 0, randint(keys[5], 0, b.num_rows), kind=OBJ_KEY, color=door_color
        )

        s = b.place_agent(keys[6], s, 1, b.num_rows // 2)
        s = b.connect_all(keys[7], s)

        return new_state(
            grid=s.grid,
            agent_pos=s.agent_pos,
            agent_dir=s.agent_dir,
            rng=jax.random.fold_in(key, 1),
            max_steps=self.max_steps,
            mission=mission_vec(
                _MISSION_PICKUP, obj_color.astype(jnp.int32), int(self.obj_kind)
            ),
            extra={"target_color": obj_color.astype(jnp.int32)},
        )

    def _post_step(self, prev_state, state, action, reward):
        success = (
            (jnp.asarray(action, jnp.int32) == Actions.pickup)
            & (carry_type(state.carrying) == self.obj_kind)
            & (carry_color(state.carrying).astype(jnp.int32) == state.extra["target_color"])
        )
        reward = jnp.where(success, success_reward(state), reward)
        return state.replace(terminated=state.terminated | success), reward


class _KeyCorridorFusedExt(fx.FusedExt):
    """Block twin of KeyCorridorEnv._post_step: pickup of the target-kind
    object in the commanded color succeeds."""

    n_scalars = 1

    def pack_extra(self, env, extra):
        return extra["target_color"].astype(jnp.int32)[..., None], None

    def unpack_extra(self, env, scal, planes):
        return {"target_color": scal[..., 0]}

    def post_step(self, ctx):
        carry = ctx.sc[fx.ROW_CARRY]
        success = (
            (ctx.action == Actions.pickup)
            & (fx.carry_type(carry) == ctx.env.obj_kind)
            & (fx.carry_color(carry) == ctx.scal[0])
        )
        reward = jnp.where(success, ctx.success_reward(), ctx.reward)
        return success, reward, ctx.scal, ctx.planes


KeyCorridorEnv.fused_ext = _KeyCorridorFusedExt()

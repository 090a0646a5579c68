"""GoToDoor (reference: minigrid/envs/gotodoor.py:66-149)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minigrid_tpu.core import grid as g
from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import OBJ_DOOR, SORTED_COLOR_IDX, STATE_CLOSED, cell
from minigrid_tpu.core.env import MiniGridEnv, success_reward
from minigrid_tpu.core.mission import mission_vec, register_mission
from minigrid_tpu.core.sampling import place_obj_pos, rand_dir, randint
from minigrid_tpu.core.state import EnvState, new_state
from minigrid_tpu.envs.gotoobject import GoToTargetFusedExt

_MISSION = register_mission("go to the {0} door", ("color",))


class GoToDoorEnv(MiniGridEnv):
    """Randomly sized room with 4 distinct-colored doors; the agent must
    perform `done` next to the target door
    (reference: minigrid/envs/gotodoor.py:91-149)."""

    # Level generation (placement rejection loops / river-path sampling)
    # costs multiples of a step; batched rollouts amortize it through the
    # per-chunk reset cache (minigrid_tpu/parallel/vector.py).
    expensive_reset = True

    def __init__(self, size: int = 5, max_steps: int | None = None, **kwargs):
        assert size >= 5
        if max_steps is None:
            max_steps = 4 * size**2
        super().__init__(
            width=size,
            height=size,
            max_steps=max_steps,
            see_through_walls=True,
            **kwargs,
        )

    def _generate(self, key: jax.Array) -> EnvState:
        w, h = self.width, self.height
        keys = jax.random.split(key, 12)
        # Randomly vary the room dims in [5, size] (reference :96-97).
        rw = randint(keys[0], 5, w + 1)
        rh = randint(keys[1], 5, h + 1)
        grid = g.empty_grid(w, h)
        outer = g.rect_mask(w, h, 0, 0, rw, rh)
        inner = g.rect_mask(w, h, 1, 1, rw - 2, rh - 2)
        from minigrid_tpu.core.constants import WALL_CELL

        grid = g.put(grid, outer & ~inner, WALL_CELL)

        # 4 doors: top, bottom, left, right walls (reference :103-107).
        door_x = jnp.stack(
            [
                randint(keys[2], 2, rw - 2),
                randint(keys[3], 2, rw - 2),
                jnp.int32(0),
                rw - 1,
            ]
        )
        door_y = jnp.stack(
            [
                jnp.int32(0),
                rh - 1,
                randint(keys[4], 2, rh - 2),
                randint(keys[5], 2, rh - 2),
            ]
        )
        # 4 distinct colors, order uniform (reference rejection loop :110-115
        # == uniform prefix of a permutation).
        colors = jnp.asarray(SORTED_COLOR_IDX)[
            jax.random.permutation(keys[6], 6)[:4]
        ]
        for i in range(4):
            grid = g.set_cell(
                grid, door_x[i], door_y[i], cell(OBJ_DOOR, colors[i], STATE_CLOSED)
            )

        agent_pos = place_obj_pos(keys[7], grid, size=(rw, rh))
        agent_dir = rand_dir(keys[8])

        target = randint(keys[9], 0, 4)
        t_pos = jnp.stack([door_x[target], door_y[target]])
        t_color = colors[target].astype(jnp.int32)

        return new_state(
            grid=grid,
            agent_pos=agent_pos,
            agent_dir=agent_dir,
            rng=keys[10],
            max_steps=self.max_steps,
            mission=mission_vec(_MISSION, t_color),
            extra={"target_pos": t_pos},
        )

    def _post_step(self, prev_state, state, action, reward):
        a = jnp.asarray(action, jnp.int32)
        ax, ay = state.agent_pos[0], state.agent_pos[1]
        tx, ty = state.extra["target_pos"][0], state.extra["target_pos"][1]
        next_to = ((ax == tx) & (jnp.abs(ay - ty) == 1)) | (
            (ay == ty) & (jnp.abs(ax - tx) == 1)
        )
        is_done = a == Actions.done
        reward = jnp.where(is_done & next_to, success_reward(state), reward)
        terminated = state.terminated | (a == Actions.toggle) | is_done
        return state.replace(terminated=terminated), reward


GoToDoorEnv.fused_ext = GoToTargetFusedExt()

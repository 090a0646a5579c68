"""Functional environment base class.

The reference couples episode state to a mutable ``gym.Env`` object
(reference: minigrid/minigrid_env.py:24-157).  Here an env instance is an
immutable bundle of *static* configuration; all dynamics are pure functions
``(key, state, action) -> (obs, state, ...)`` that jit, vmap and scan.  The
single-env methods below are the semantic core; batching lives in
minigrid_tpu.parallel.

Auto-reset is fused into ``step``: when an episode ends, the returned state
is a freshly generated episode (from the state's own key chain) and the
returned observation is its first observation, with ``terminated/truncated``
flags reporting the *ending* episode — the standard lockstep-vectorization
contract.
"""

from __future__ import annotations

from functools import cached_property
from typing import Any

import jax
import jax.numpy as jnp

from minigrid_tpu.core import obs as obs_lib
from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.core.step import core_step


def success_reward(state: EnvState) -> jnp.ndarray:
    """Reference success reward 1 - 0.9*(step_count/max_steps)
    (minigrid/minigrid_env.py:240-245)."""
    return 1.0 - 0.9 * (
        state.step_count.astype(jnp.float32) / state.max_steps.astype(jnp.float32)
    )


class MiniGridEnv:
    """Base for all env families.

    Subclasses implement ``_generate(key) -> EnvState`` (the analogue of the
    reference's ``_gen_grid``, minigrid/minigrid_env.py:236-238) and may
    override ``_pre_step`` / ``_post_step`` for family-specific dynamics and
    reward shaping (the analogue of subclass ``step`` overrides).
    """

    def __init__(
        self,
        width: int,
        height: int,
        max_steps: int,
        see_through_walls: bool = False,
        agent_view_size: int = 7,
        **kwargs: Any,
    ):
        assert agent_view_size % 2 == 1 and agent_view_size >= 3
        self.width = int(width)
        self.height = int(height)
        self.max_steps = int(max_steps)
        self.see_through_walls = bool(see_through_walls)
        self.agent_view_size = int(agent_view_size)

    # -- static spaces -------------------------------------------------------
    @property
    def num_actions(self) -> int:
        return NUM_ACTIONS

    @cached_property
    def obs_shape(self) -> tuple[int, int, int]:
        return (self.agent_view_size, self.agent_view_size, 3)

    # -- to be provided by subclasses ---------------------------------------
    def _generate(self, key: jax.Array) -> EnvState:
        raise NotImplementedError

    def _map_action(self, action):
        """Family-specific action remapping applied before the core step
        (e.g. Memory's pickup->toggle, reference minigrid/envs/memory.py:154)."""
        return action

    def _pre_step(self, key: jax.Array, state: EnvState, action) -> EnvState:
        """Dynamics that run before the agent's action (e.g. moving obstacles)."""
        return state

    def _post_step(
        self,
        prev_state: EnvState,
        state: EnvState,
        action,
        reward: jnp.ndarray,
    ) -> tuple[EnvState, jnp.ndarray]:
        """Family-specific reward/termination overlay."""
        return state, reward

    # -- public functional API ------------------------------------------------
    def observation(self, state: EnvState):
        return obs_lib.gen_obs(state, self.agent_view_size, self.see_through_walls)

    def observation_packed(self, state: EnvState) -> jnp.ndarray:
        """int32[v, v] packed view (learner-side observation; see
        core/obs.gen_obs_packed).  ``unpack_grid`` of this equals
        ``observation(state)["image"]`` exactly."""
        return obs_lib.gen_obs_packed(
            state, self.agent_view_size, self.see_through_walls
        )

    def reset(self, key: jax.Array):
        state = self._generate(key)
        return self.observation(state), state

    def step_env(self, state: EnvState, action):
        """One raw transition without auto-reset."""
        key, k_pre = jax.random.split(state.rng)
        state = state.replace(rng=key)
        mapped = self._map_action(action)
        state = self._pre_step(k_pre, state, action)
        prev = state
        state, reward = core_step(state, mapped)
        state, reward = self._post_step(prev, state, action, reward)
        return state, reward

    # Families whose per-episode generation is expensive (rejection-resampled
    # RoomGrid levels, WFC solves, recursive room chains) set this True;
    # batched rollouts then amortize generation with a per-chunk reset cache
    # (minigrid_tpu/parallel/vector.py) instead of regenerating every step.
    expensive_reset: bool = False

    # ``_generate``'s level is the same for EVERY key (the key only seeds the
    # state's rng chain) — e.g. fixed-start Empty, DistShift.  A 1-slot reset
    # cache then reproduces the reference's fresh-level-per-reset contract
    # exactly (every "fresh" level equals every other), so these families are
    # exempt from the covering-R sizing in parallel/reset_budget.py.  May be
    # set per-instance (EmptyEnv: only when agent_start_pos is fixed).
    deterministic_generation: bool = False

    # Kernel-specialization capability flags (ops/fused_rollout.py /
    # ops/actor_rollout.py).  Purely an optimization contract — the XLA path
    # ignores them, and per-family fused-vs-XLA bit-exactness tests
    # (tests/test_fused_rollout.py) enforce that a family setting them really
    # has the claimed property.
    #
    # ``fused_no_objects``: the family's grids never contain a cell the core
    # transition can mutate (no keys/balls/boxes/doors — only empty, wall,
    # goal, lava, floor), so pickup/drop/toggle can never fire: the kernels
    # skip the contains-plane reduce, the grid/contains write-back, and the
    # carry update.  (An ext ``pre_step`` may still rewrite the grid, e.g.
    # the Dynamic-Obstacles walk — the flag only covers the core step.)
    fused_no_objects: bool = False
    # ``fused_static_mission``: the mission vector is a family constant
    # (seed-independent), so the auto-reset mission blend is the identity
    # and the kernels skip it.
    fused_static_mission: bool = False

    def reset_cache(self, key: jax.Array, num_resets: int) -> EnvState:
        """Pytree of ``num_resets`` pre-generated fresh episodes (leading
        axis R) for amortized auto-reset inside a rollout chunk."""
        return jax.vmap(self._generate)(jax.random.split(key, num_resets))

    # Opt-in: build the reset cache from ONE flat vmap over num_envs *
    # num_resets generate calls instead of the nested per-env form below.
    # Both draw iid levels from fresh key splits (identical distribution);
    # which lowers faster is family-specific — measured on the v5e,
    # LavaCrossingS9N2's generator (permutation + sort + dynamic-bound
    # randints) is 10x FASTER flat (69.4 -> 6.8 ms for the 65536x2 cache)
    # and ObstructedMaze ~1.7x, while FourRooms is faster nested — so this
    # stays per-family opt-in rather than the default.
    flat_reset_pool: bool = False

    def batch_reset_cache(self, key: jax.Array, num_envs: int, num_resets: int):
        """[num_envs, num_resets] cache of fresh episodes.  Families with
        attempt-level rejection sampling override this with a pooled
        generator (see babyai RoomGridLevel.batch_reset_cache)."""
        if self.flat_reset_pool:
            from minigrid_tpu.utils.chunked import chunked_vmap, lane_cap

            total = num_envs * num_resets
            states = chunked_vmap(
                self._generate,
                jax.random.split(key, total),
                lane_cap(self.width * self.height),
            )
            return jax.tree.map(
                lambda a: a.reshape((num_envs, num_resets) + a.shape[1:]), states
            )
        return jax.vmap(self.reset_cache, in_axes=(0, None))(
            jax.random.split(key, num_envs), num_resets
        )

    def step_cached(self, state: EnvState, action, cache: EnvState, used):
        """Transition with auto-reset drawn from a pre-generated cache.

        ``cache`` holds R fresh episodes (leading axis); ``used`` counts
        resets already consumed — the r-th episode end pulls cache slot
        min(r, R-1).  Identical per-step semantics to :meth:`step` AS LONG AS
        no env consumes more than R resets in the chunk: past that the last
        slot is REPLAYED, a level stream the reference's fresh-reset contract
        (reference: minigrid/minigrid_env.py:119-143) never produces.  Every
        caller must therefore size R to cover the config's episode rate
        (parallel/reset_budget.resets_for) and check the returned ``used``
        against R — ``used.max() <= R`` certifies the chunk was replay-free
        (``deterministic_generation`` families are exempt: all their fresh
        levels are identical, so replay IS the reference distribution).

        Returns (obs, state, reward, terminated, truncated, used).
        """
        stepped, reward = self.step_env(state, action)
        terminated, truncated = stepped.terminated, stepped.truncated
        done = terminated | truncated
        num = jax.tree.leaves(cache)[0].shape[0]
        fresh = jax.tree.map(lambda a: a[0], cache)
        for r in range(1, num):
            take = used >= r
            fresh = jax.tree.map(
                lambda f, a, t=take: jnp.where(
                    jnp.reshape(t, (1,) * f.ndim) if f.ndim else t, a[r], f
                ),
                fresh,
                cache,
            )
        state = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, a, b
            ),
            fresh,
            stepped,
        )
        return (
            self.observation(state),
            state,
            reward,
            terminated,
            truncated,
            used + done.astype(jnp.int32),
        )

    def autoreset(self, stepped: EnvState) -> EnvState:
        """Blend a freshly generated episode into slots where the episode
        ended (the reset key comes from the state's own key chain)."""
        done = stepped.terminated | stepped.truncated
        reset_key, carry_key = jax.random.split(stepped.rng)
        fresh = self._generate(reset_key)
        stepped = stepped.replace(rng=carry_key)
        return jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, a, b
            ),
            fresh,
            stepped,
        )

    def step(self, state: EnvState, action):
        """Transition with fused auto-reset.

        Returns (obs, state, reward, terminated, truncated).
        """
        stepped, reward = self.step_env(state, action)
        terminated, truncated = stepped.terminated, stepped.truncated
        state = self.autoreset(stepped)
        return self.observation(state), state, reward, terminated, truncated

    # -- rendering -------------------------------------------------------------
    def get_frame(
        self,
        state: EnvState,
        highlight: bool = True,
        tile_size: int = 32,
        agent_pov: bool = False,
    ):
        """RGB frame of the current state (reference: minigrid_env.py:716-739)."""
        from minigrid_tpu.render.frame import get_frame

        return get_frame(
            state,
            self.agent_view_size,
            self.see_through_walls,
            highlight=highlight,
            tile_size=tile_size,
            agent_pov=agent_pov,
        )

    def render(self, state: EnvState, tile_size: int = 32):
        """rgb_array render (reference render_mode="rgb_array",
        minigrid_env.py:741-785)."""
        import numpy as np

        return np.asarray(self.get_frame(state, tile_size=tile_size))

    # -- host-side conveniences ----------------------------------------------
    def mission_text(self, mission) -> str:
        """Render a mission vector to the reference's mission string."""
        from minigrid_tpu.core.mission import mission_to_text

        return mission_to_text(mission)

"""Reward/action/termination wrappers (reference: minigrid/wrappers.py)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from minigrid_tpu.core.actions import Actions
from minigrid_tpu.core.constants import DIR_TO_VEC, OBJECT_TO_IDX
from minigrid_tpu.core.grid import get_cell
from minigrid_tpu.core.state import EnvState
from minigrid_tpu.wrappers.base import Wrapper


@struct.dataclass
class CountingState:
    """Wrapper-held memory (exploration counts persist across episodes, as
    the reference's mutable ``self.counts`` dict does)."""

    env: EnvState
    counts: jnp.ndarray


class _BonusWrapper(Wrapper):
    """Shared machinery for exploration bonuses: reward += 1/sqrt(N) of the
    post-step key, counts carried in the wrapper state."""

    def _counts_shape(self) -> tuple[int, ...]:
        raise NotImplementedError

    def _count_index(self, stepped: EnvState, action):
        raise NotImplementedError

    def reset(self, key: jax.Array):
        obs, env_state = self.env.reset(key)
        counts = jnp.zeros(self._counts_shape(), jnp.int32)
        return obs, CountingState(env=env_state, counts=counts)

    def step(self, state: CountingState, action):
        stepped, reward = self.env.step_env(state.env, action)
        idx = self._count_index(stepped, action)
        new_count = state.counts[idx] + 1
        counts = state.counts.at[idx].set(new_count)
        reward = reward + 1.0 / jnp.sqrt(new_count.astype(jnp.float32))
        terminated, truncated = stepped.terminated, stepped.truncated
        env_state = self.env.autoreset(stepped)
        return (
            self.observation(env_state),
            CountingState(env=env_state, counts=counts),
            reward,
            terminated,
            truncated,
        )

    def observation(self, state):
        if isinstance(state, CountingState):
            state = state.env
        return self.env.observation(state)


class ActionBonus(_BonusWrapper):
    """+1/sqrt(N(pos, dir, action)) (reference: minigrid/wrappers.py:70-125)."""

    def _counts_shape(self):
        e = self.unwrapped
        return (e.width, e.height, 4, 7)

    def _count_index(self, stepped, action):
        return (
            stepped.agent_x,
            stepped.agent_y,
            stepped.agent_dir,
            jnp.asarray(action, jnp.int32),
        )


class PositionBonus(_BonusWrapper):
    """+1/sqrt(N(pos)) (reference: minigrid/wrappers.py:128-187).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import PositionBonus
        >>> env = PositionBonus(mg.make("MiniGrid-Empty-5x5-v0"))
        >>> obs, state = env.reset(jax.random.PRNGKey(0))
        >>> obs, state, reward, term, trunc = env.step(state, 6)  # done: stay put
        >>> float(reward)  # first visit of the start cell: +1/sqrt(1)
        1.0
        >>> obs, state, reward, term, trunc = env.step(state, 6)
        >>> round(float(reward), 4)  # second visit: +1/sqrt(2)
        0.7071
    """

    def _counts_shape(self):
        e = self.unwrapped
        return (e.width, e.height)

    def _count_index(self, stepped, action):
        return (stepped.agent_x, stepped.agent_y)


class StochasticActionWrapper(Wrapper):
    """Execute the chosen action with probability ``prob``, else a random one
    (reference: minigrid/wrappers.py:773-794; the random fallback draws from
    [0, 6), excluding `done`, as the reference does)."""

    def __init__(self, env, prob: float = 0.9, random_action: int | None = None):
        super().__init__(env)
        self.prob = float(prob)
        self.random_action = random_action

    def step_env(self, state, action):
        key, k_keep, k_rand = jax.random.split(state.rng, 3)
        state = state.replace(rng=key)
        keep = jax.random.uniform(k_keep) < self.prob
        if self.random_action is None:
            alt = jax.random.randint(k_rand, (), 0, 6, dtype=jnp.int32)
        else:
            alt = jnp.asarray(self.random_action, jnp.int32)
        action = jnp.where(keep, jnp.asarray(action, jnp.int32), alt)
        return self.env.step_env(state, action)


class NoDeath(Wrapper):
    """Convert deaths on the given cell types into a negative reward and
    continue the episode (reference: minigrid/wrappers.py:797-870).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import NoDeath
        >>> env = NoDeath(mg.make("MiniGrid-LavaGapS5-v0"), no_death_types=("lava",))
        >>> obs, state = env.reset(jax.random.PRNGKey(0))
        >>> for _ in range(3):  # walk into the lava gap column
        ...     obs, state, reward, term, trunc = env.step(state, 2)
        >>> bool(term)  # stepping into lava no longer terminates
        False
    """

    def __init__(self, env, no_death_types: tuple[str, ...], death_cost: float = -1.0):
        assert "goal" not in no_death_types
        super().__init__(env)
        self.death_cost = float(death_cost)
        self.no_death_idx = tuple(OBJECT_TO_IDX[t] for t in no_death_types)

    def _is_death_type(self, obj_type):
        m = jnp.zeros((), bool)
        for t in self.no_death_idx:
            m = m | (obj_type == t)
        return m

    def step_env(self, state, action):
        from minigrid_tpu.core.constants import cell_type

        w, h = state.grid.shape[:2]
        fx = jnp.clip(state.agent_x + DIR_TO_VEC[state.agent_dir][0], 0, w - 1)
        fy = jnp.clip(state.agent_y + DIR_TO_VEC[state.agent_dir][1], 0, h - 1)
        fcell = get_cell(state.grid, fx, fy)
        going_to_death = (
            jnp.asarray(action, jnp.int32) == Actions.forward
        ) & self._is_death_type(cell_type(fcell))

        stepped, reward = self.env.step_env(state, action)

        cur = get_cell(stepped.grid, stepped.agent_x, stepped.agent_y)
        in_death = self._is_death_type(cell_type(cur))
        cancel = stepped.terminated & (going_to_death | in_death)
        reward = jnp.where(cancel, reward + self.death_cost, reward)
        stepped = stepped.replace(terminated=stepped.terminated & ~cancel)
        return stepped, reward


class ReseedWrapper(Wrapper):
    """Deterministic evaluation: reset keys cycle a fixed seed list
    (reference: minigrid/wrappers.py:17-67).  The cycle index is host-side
    Python state, mirroring the reference's mutable wrapper.

    Example:
        >>> import jax
        >>> import numpy as np
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import ReseedWrapper
        >>> env = ReseedWrapper(mg.make("MiniGrid-Empty-Random-5x5-v0"), seeds=[3, 5])
        >>> _, s1 = env.reset()
        >>> _, s2 = env.reset()
        >>> _, s3 = env.reset()  # cycles back to seed 3
        >>> bool(np.array_equal(np.asarray(s1.agent_pos), np.asarray(s3.agent_pos)))
        True
    """

    def __init__(self, env, seeds=(0,), seed_idx: int = 0):
        super().__init__(env)
        self.seeds = list(seeds)
        self.seed_idx = int(seed_idx)

    def reset(self, key: jax.Array = None):
        seed = self.seeds[self.seed_idx]
        self.seed_idx = (self.seed_idx + 1) % len(self.seeds)
        return self.env.reset(jax.random.PRNGKey(seed))

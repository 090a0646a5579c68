"""Functional wrapper base.

Reference wrappers subclass gymnasium's mutable Wrapper protocol
(minigrid/wrappers.py).  Here a wrapper is an env-like object delegating to an
inner env; observation wrappers override ``observation(state)``; wrappers
with their own memory (exploration bonuses) carry it in a ``WrapperState``
pytree threaded alongside the env state, so everything stays jit/vmap-able.
"""

from __future__ import annotations

import jax


class Wrapper:
    """Transparent delegating wrapper."""

    def __init__(self, env):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    @property
    def unwrapped(self):
        e = self.env
        while isinstance(e, Wrapper):
            e = e.env
        return e

    def reset(self, key: jax.Array):
        obs, state = self.env.reset(key)
        return self.observation(state), state

    def step_env(self, state, action):
        return self.env.step_env(state, action)

    def step(self, state, action):
        stepped, reward = self.step_env(state, action)
        terminated, truncated = stepped.terminated, stepped.truncated
        state = self.env.autoreset(stepped)
        return self.observation(state), state, reward, terminated, truncated

    def observation(self, state):
        return self.env.observation(state)

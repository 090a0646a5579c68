"""Gymnasium single-env host adapter.

The native API here is functional (pure ``reset``/``step`` over ``EnvState``
pytrees, batched with ``vmap``); this shim wraps one env instance in the
mutable ``gymnasium.Env`` protocol so existing gymnasium tooling
(``check_env``, wrappers, SyncVectorEnv) and reference-style user code work
unchanged (reference surface: minigrid/minigrid_env.py:24-157).  It is a
conformance/interop layer, not the hot path — rollouts at scale should stay
on the functional API.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from minigrid_tpu.core.actions import NUM_ACTIONS
from minigrid_tpu.core.constants import (
    DIR_TO_VEC,
    OBJ_AGENT,
    OBJ_EMPTY,
    OBJ_UNSEEN,
    cell_type,
)
from minigrid_tpu.registry import make

try:  # gymnasium is optional; the adapter degrades to a plain class.
    import gymnasium as _gym

    _EnvBase = _gym.Env
except ImportError:  # pragma: no cover
    _EnvBase = object


class GymnasiumMiniGrid(_EnvBase):
    """``gymnasium.Env`` adapter over a functional env family."""

    metadata = {"render_modes": ["human", "rgb_array"], "render_fps": 10}

    def __init__(
        self,
        env,
        render_mode: str | None = None,
        tile_size: int = 32,
        screen_size: int = 640,
        highlight: bool = True,
        agent_pov: bool = False,
        parity: bool = False,
    ):
        import gymnasium as gym

        self.env = env
        self.render_mode = render_mode
        self.tile_size = tile_size
        self.screen_size = screen_size
        self.highlight = highlight
        self.agent_pov = agent_pov
        # pygame window state for render_mode="human"
        # (reference: minigrid/minigrid_env.py:89-92).
        self.window = None
        self.clock = None
        self.state = None
        self._episode = 0
        self._base_seed = 0
        # Seed-parity mode: reset(seed=s) rebuilds exactly the episode the
        # reference builds for s (minigrid_tpu/compat/parity.py), and
        # step-time RNG (DynamicObstacles obstacle walk) is host-mirrored.
        self.parity = bool(parity)
        self._parity_roll = None
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step_env)
        self._frame_fn = jax.jit(
            lambda s: env.get_frame(
                s, highlight=highlight, tile_size=tile_size, agent_pov=agent_pov
            )
        )

        v = env.agent_view_size
        self.action_space = gym.spaces.Discrete(NUM_ACTIONS)
        self.observation_space = gym.spaces.Dict(
            {
                "image": gym.spaces.Box(0, 255, (v, v, 3), dtype=np.uint8),
                "direction": gym.spaces.Discrete(4),
                "mission": gym.spaces.Text(
                    max_length=256,
                    charset=frozenset(
                        "abcdefghijklmnopqrstuvwxyz ,0123456789"
                    ),
                ),
            }
        )
        self.reward_range = getattr(env, "reward_range", (0.0, 1.0))
        self.spec = None

    # -- gymnasium protocol ----------------------------------------------------
    def reset(self, *, seed: int | None = None, options: dict | None = None):
        if _EnvBase is not object:
            super().reset(seed=seed)  # seeds self.np_random per gym contract
        if self.parity:
            from minigrid_tpu.compat.parity import ParityRollout

            if self._parity_roll is None:
                self._parity_roll = ParityRollout(self.env, seed)
                obs = self._parity_roll.observation()
            else:
                obs = self._parity_roll.reset(seed=seed)
            self.state = self._parity_roll.state
            if self.render_mode == "human":
                self.render()
            return self._convert_obs(obs), {}
        if seed is not None:
            self._base_seed = seed
            self._episode = 0
        key = jax.random.fold_in(
            jax.random.PRNGKey(self._base_seed), self._episode
        )
        self._episode += 1
        obs, self.state = self._reset_fn(key)
        # Reference opens/refreshes the pygame window on reset in human mode
        # (minigrid/minigrid_env.py:151-152).
        if self.render_mode == "human":
            self.render()
        return self._convert_obs(obs), {}

    def step(self, action):
        assert self.state is not None, "call reset() before step()"
        if self.parity:
            obs, reward, terminated, truncated = self._parity_roll.step(int(action))
            self.state = self._parity_roll.state
            if self.render_mode == "human":
                self.render()
            return self._convert_obs(obs), float(reward), terminated, truncated, {}
        self.state, reward = self._step_fn(self.state, int(action))
        obs = self.env.observation(self.state)
        # Reference renders every step in human mode (minigrid_env.py:590-591).
        if self.render_mode == "human":
            self.render()
        return (
            self._convert_obs(obs),
            float(reward),
            bool(self.state.terminated),
            bool(self.state.truncated),
            {},
        )

    def render(self):
        if self.state is None:
            return None
        img = np.asarray(self._frame_fn(self.state))
        if self.render_mode == "human":
            self._render_human(img)
            return None
        return img

    def _render_human(self, img: np.ndarray) -> None:
        """Live pygame window with the mission caption — the reference's
        human-mode path (minigrid/minigrid_env.py:744-782): transpose to
        pygame's (x, y) surface layout, white margin, mission text centered
        near the bottom, smoothscale to ``screen_size``, clock.tick at
        ``metadata["render_fps"]``."""
        import pygame
        import pygame.freetype

        img = np.transpose(img, axes=(1, 0, 2))
        if self.window is None:
            pygame.init()
            pygame.display.init()
            self.window = pygame.display.set_mode(
                (self.screen_size, self.screen_size)
            )
            pygame.display.set_caption("minigrid")
        if self.clock is None:
            self.clock = pygame.time.Clock()
        surf = pygame.surfarray.make_surface(img)

        offset = surf.get_size()[0] * 0.1
        bg = pygame.Surface(
            (int(surf.get_size()[0] + offset), int(surf.get_size()[1] + offset))
        )
        bg.convert()
        bg.fill((255, 255, 255))
        bg.blit(surf, (offset / 2, 0))
        bg = pygame.transform.smoothscale(bg, (self.screen_size, self.screen_size))

        font_size = 22
        text = self.mission
        font = pygame.freetype.SysFont(pygame.font.get_default_font(), font_size)
        text_rect = font.get_rect(text, size=font_size)
        text_rect.center = bg.get_rect().center
        text_rect.y = bg.get_height() - font_size * 1.5
        font.render_to(bg, text_rect, text, size=font_size)

        self.window.blit(bg, (0, 0))
        pygame.event.pump()
        self.clock.tick(self.metadata["render_fps"])
        pygame.display.flip()

    def close(self):
        if self.window is not None:
            import pygame

            pygame.quit()
            self.window = None

    # -- pickling (reference conformance: tests/test_envs.py:174-184 pickles
    # the env and requires the clone to behave identically) -------------------
    def __getstate__(self):
        # Jitted closures and the pygame window/clock are process-local
        # handles; everything else (env family config, EnvState pytree,
        # episode counters, parity rollout) round-trips.
        state = self.__dict__.copy()
        for k in ("_reset_fn", "_step_fn", "_frame_fn", "window", "clock"):
            state[k] = None
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        env = self.env
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step_env)
        self._frame_fn = jax.jit(
            lambda s: env.get_frame(
                s,
                highlight=self.highlight,
                tile_size=self.tile_size,
                agent_pov=self.agent_pov,
            )
        )

    @property
    def unwrapped(self):
        return self

    # -- conveniences mirroring the reference's attribute surface ---------------
    @property
    def agent_pos(self):
        return (int(self.state.agent_x), int(self.state.agent_y))

    @property
    def agent_dir(self) -> int:
        return int(self.state.agent_dir)

    @property
    def step_count(self) -> int:
        return int(self.state.step_count)

    @property
    def max_steps(self) -> int:
        return int(self.state.max_steps)

    @property
    def mission(self) -> str:
        return self.env.mission_text(self.state.mission)

    @property
    def steps_remaining(self) -> int:
        # reference: minigrid/minigrid_env.py:171-173
        return self.max_steps - self.step_count

    @property
    def carrying(self) -> tuple[int, int] | None:
        """(type, color) of the carried object, or None (the functional
        state packs carrying as one int; reference keeps a WorldObj)."""
        c = int(self.state.carrying)
        return None if c == 0 else (c & 0xFF, (c >> 8) & 0xFF)

    @property
    def dir_vec(self):
        # reference: minigrid/minigrid_env.py:397-407
        d = self.agent_dir
        assert 0 <= d < 4, f"Invalid agent_dir: {d} is not within range(0, 4)"
        return np.asarray(DIR_TO_VEC)[d]

    @property
    def right_vec(self):
        dx, dy = self.dir_vec
        return np.array((-dy, dx))

    @property
    def front_pos(self):
        return np.asarray(self.agent_pos) + self.dir_vec

    def get_view_coords(self, i, j):
        """World (i, j) -> agent-view coordinates; may land outside the view
        (reference: minigrid/minigrid_env.py:426-451)."""
        ax, ay = self.agent_pos
        dx, dy = self.dir_vec
        rx, ry = self.right_vec
        sz = self.env.agent_view_size
        hs = sz // 2
        tx = ax + dx * (sz - 1) - rx * hs
        ty = ay + dy * (sz - 1) - ry * hs
        lx, ly = i - tx, j - ty
        return int(rx * lx + ry * ly), int(-(dx * lx + dy * ly))

    def relative_coords(self, x, y):
        """View coords of world (x, y), or None when outside the view box
        (reference: minigrid/minigrid_env.py:486-496)."""
        vx, vy = self.get_view_coords(x, y)
        sz = self.env.agent_view_size
        if vx < 0 or vy < 0 or vx >= sz or vy >= sz:
            return None
        return vx, vy

    def in_view(self, x, y) -> bool:
        return self.relative_coords(x, y) is not None

    def agent_sees(self, x, y) -> bool:
        """True when the non-empty world cell (x, y) is inside the view box
        AND survives occlusion, judged exactly like the reference — by
        comparing the encoded observation's type against the world cell's
        (reference: minigrid/minigrid_env.py:505-523, including its assert
        that the queried cell is non-empty)."""
        coordinates = self.relative_coords(x, y)
        if coordinates is None:
            return False
        vx, vy = coordinates

        obs = self.env.observation(self.state)
        obs_type = int(np.asarray(obs["image"])[vx, vy, 0])
        world_type = int(cell_type(self.state.grid[x, y]))
        assert world_type != OBJ_EMPTY  # reference asserts world_cell is not None
        # Grid.decode maps unseen/empty/agent to None (world_object.py:77-78).
        return obs_type not in (OBJ_UNSEEN, OBJ_EMPTY, OBJ_AGENT) and (
            obs_type == world_type
        )

    def hash(self, size: int = 16) -> str:
        from minigrid_tpu.utils.debug import state_hash

        return state_hash(self.state, size)

    def pprint_grid(self) -> str:
        from minigrid_tpu.utils.debug import pprint_grid

        return pprint_grid(self.state)

    def __str__(self):
        return self.pprint_grid()

    # -- internals -----------------------------------------------------------------
    def _convert_obs(self, obs) -> dict[str, Any]:
        return {
            "image": np.asarray(obs["image"]),
            "direction": int(obs["direction"]),
            "mission": self.env.mission_text(obs["mission"]),
        }


def gym_make(
    env_id: str,
    render_mode: str | None = None,
    parity: bool = False,
    **kwargs,
):
    """``gym.make``-alike returning the adapter directly.

    Display kwargs (``tile_size``/``screen_size``/``highlight``/``agent_pov``,
    the reference's MiniGridEnv ctor surface, minigrid_env.py:34-48) go to the
    adapter; everything else goes to the env family constructor.
    ``parity=True`` makes ``reset(seed=s)`` reproduce the reference's episode
    for ``s`` bit-exactly (see minigrid_tpu/compat/parity.py)."""
    shim_kwargs = {
        k: kwargs.pop(k)
        for k in ("tile_size", "screen_size", "highlight", "agent_pov")
        if k in kwargs
    }
    return GymnasiumMiniGrid(
        make(env_id, **kwargs), render_mode=render_mode, parity=parity,
        **shim_kwargs,
    )


def register_gymnasium_envs(prefix: str = "") -> int:
    """Register every env id into the gymnasium registry so literal
    ``gymnasium.make("MiniGrid-…")`` works (the reference wires this as a
    package entry point, reference pyproject.toml
    [project.entry-points."gymnasium.envs"] -> minigrid/__init__.py:24).

    Returns the number of ids registered.  ``prefix`` optionally namespaces
    the ids (e.g. "TPU/").
    """
    import gymnasium as gym

    from minigrid_tpu.registry import registered_ids

    count = 0
    for env_id in registered_ids():
        gym_id = prefix + env_id
        if gym_id in gym.envs.registry:
            continue
        gym.register(
            id=gym_id,
            entry_point=_gym_entry_point,
            kwargs={"minigrid_tpu_env_id": env_id},
        )
        count += 1
    return count


def _gym_entry_point(minigrid_tpu_env_id: str, render_mode=None, **kwargs):
    return gym_make(minigrid_tpu_env_id, render_mode=render_mode, **kwargs)

"""render_mode="human" in the gymnasium shim.

The reference renders a live pygame window with the mission caption on every
reset/step in human mode (reference: minigrid/minigrid_env.py:151-152,
590-591, 744-782).  These tests run the real pygame path headless under
SDL's dummy video driver — stronger than mocking the surface calls.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

os.environ.setdefault("SDL_VIDEODRIVER", "dummy")

pygame = pytest.importorskip("pygame")

from minigrid_tpu.compat.gym import gym_make  # noqa: E402


def test_human_mode_opens_window_and_ticks():
    env = gym_make("MiniGrid-Empty-5x5-v0", render_mode="human")
    assert "human" in env.metadata["render_modes"]
    env.reset(seed=1)
    # Reference opens the window during reset (minigrid_env.py:151-152).
    assert env.window is not None
    assert env.window.get_size() == (640, 640)
    for action in (0, 2, 1):
        env.step(action)
    # clock.tick() ran (minigrid_env.py:781) — a Clock was created.
    assert env.clock is not None
    # render() returns None in human mode (the frame goes to the window).
    assert env.render() is None
    env.close()
    assert env.window is None


def test_human_mode_mission_caption_drawn():
    """The window must contain non-background pixels (grid + caption blit)."""
    env = gym_make("MiniGrid-DoorKey-5x5-v0", render_mode="human", screen_size=320)
    env.reset(seed=7)
    arr = pygame.surfarray.array3d(env.window)
    assert arr.shape == (320, 320, 3)
    assert (arr != 255).any(), "window is blank — nothing was blitted"
    env.close()


def test_rgb_array_mode_unchanged():
    env = gym_make("MiniGrid-Empty-5x5-v0", render_mode="rgb_array")
    env.reset(seed=1)
    img = env.render()
    assert isinstance(img, np.ndarray) and img.ndim == 3 and img.shape[2] == 3
    assert env.window is None  # no pygame involvement
    env.close()

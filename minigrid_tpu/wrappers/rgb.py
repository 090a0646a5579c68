"""RGB observation wrappers (reference: minigrid/wrappers.py:290-381)."""

from __future__ import annotations

from minigrid_tpu.render.frame import get_frame
from minigrid_tpu.wrappers.base import Wrapper


class RGBImgObsWrapper(Wrapper):
    """Full-grid RGB render as the image observation
    (reference: minigrid/wrappers.py:290-334).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import RGBImgObsWrapper
        >>> env = RGBImgObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"), tile_size=8)
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape
        (40, 40, 3)
    """

    def __init__(self, env, tile_size: int = 8, highlight: bool = True):
        super().__init__(env)
        self.tile_size = tile_size
        self.highlight = highlight

    def observation(self, state):
        o = self.env.observation(state)
        img = get_frame(
            state,
            self.unwrapped.agent_view_size,
            self.unwrapped.see_through_walls,
            highlight=self.highlight,
            tile_size=self.tile_size,
        )
        return {**o, "image": img}


class RGBImgPartialObsWrapper(Wrapper):
    """Agent-POV RGB render as the image observation
    (reference: minigrid/wrappers.py:337-381).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import RGBImgPartialObsWrapper
        >>> env = RGBImgPartialObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"), tile_size=8)
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape  # 7x7 view at 8px tiles
        (56, 56, 3)
    """

    def __init__(self, env, tile_size: int = 8):
        super().__init__(env)
        self.tile_size = tile_size

    def observation(self, state):
        o = self.env.observation(state)
        img = get_frame(
            state,
            self.unwrapped.agent_view_size,
            self.unwrapped.see_through_walls,
            tile_size=self.tile_size,
            agent_pov=True,
        )
        return {**o, "image": img}

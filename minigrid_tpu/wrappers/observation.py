"""Observation wrappers (reference: minigrid/wrappers.py).

All wrappers are pure transforms over the env state / base observation and
compose under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core import obs as obs_lib
from minigrid_tpu.core.constants import (
    cell_type,
    NUM_COLORS,
    NUM_OBJECTS,
    OBJ_AGENT,
    OBJ_EMPTY,
    OBJ_GOAL,
    COLOR_RED,
)
from minigrid_tpu.core.mission import (
    MINIGRID_WORDS,
    build_token_tables,
    mission_word_tokens,
)
from minigrid_tpu.wrappers.base import Wrapper


class ImgObsWrapper(Wrapper):
    """Image-only observation (reference: minigrid/wrappers.py:190-217).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import ImgObsWrapper
        >>> env = mg.make("MiniGrid-Empty-5x5-v0")
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> sorted(obs.keys())
        ['direction', 'image', 'mission']
        >>> obs, _ = ImgObsWrapper(env).reset(jax.random.PRNGKey(0))
        >>> obs.shape
        (7, 7, 3)
    """

    def observation(self, state):
        return self.env.observation(state)["image"]


class OneHotPartialObsWrapper(Wrapper):
    """(v, v, 3) -> (v, v, 20) one-hot of type/color/state
    (reference: minigrid/wrappers.py:220-287).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import OneHotPartialObsWrapper
        >>> env = OneHotPartialObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"))
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape
        (7, 7, 20)
    """

    def observation(self, state):
        o = self.env.observation(state)
        img = o["image"].astype(jnp.int32)
        t = jax.nn.one_hot(img[..., 0], NUM_OBJECTS, dtype=jnp.uint8)
        c = jax.nn.one_hot(img[..., 1], NUM_COLORS, dtype=jnp.uint8)
        s = jax.nn.one_hot(img[..., 2], 3, dtype=jnp.uint8)
        return {**o, "image": jnp.concatenate([t, c, s], axis=-1)}


class FullyObsWrapper(Wrapper):
    """Full symbolic grid; agent cell encoded as (agent, red, dir)
    (reference: minigrid/wrappers.py:384-423).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import FullyObsWrapper
        >>> env = FullyObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"))
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape
        (5, 5, 3)
    """

    def observation(self, state):
        from minigrid_tpu.core.constants import cell as pack_cell, unpack_grid
        from minigrid_tpu.core.grid import set_cell

        o = self.env.observation(state)
        agent_cell = pack_cell(OBJ_AGENT, COLOR_RED, state.agent_dir)
        image = set_cell(state.grid, state.agent_x, state.agent_y, agent_cell)
        return {**o, "image": unpack_grid(image)}


class DictObservationSpaceWrapper(Wrapper):
    """Mission as fixed-vocabulary word indices
    (reference: minigrid/wrappers.py:426-551).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import DictObservationSpaceWrapper
        >>> env = DictObservationSpaceWrapper(mg.make("MiniGrid-Empty-5x5-v0"))
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["mission"].shape
        (50,)
        >>> int(obs["mission"].max()) > 0  # at least one real word token
        True
    """

    def __init__(self, env, max_words_in_mission: int = 50):
        super().__init__(env)
        self.max_words_in_mission = max_words_in_mission
        self.num_words = len(MINIGRID_WORDS)
        self._tables = build_token_tables(max_words_in_mission)

    def observation(self, state):
        o = self.env.observation(state)
        return {**o, "mission": mission_word_tokens(state.mission, self._tables)}


class FlatObsWrapper(Wrapper):
    """Image + 28-char one-hot mission string flattened into one uint8 vector
    (reference: minigrid/wrappers.py:554-621).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import FlatObsWrapper
        >>> env = FlatObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"))
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs.shape  # 7*7*3 image + 96*28 mission chars
        (2835,)
    """

    NUM_CHAR_CODES = 28

    def __init__(self, env, maxStrLen: int = 96):
        super().__init__(env)
        self.max_str_len = maxStrLen
        self._tables = build_token_tables()
        # Per-word char codes: a-z -> 0-25, space -> 26, comma -> 27
        # (reference :602-608).
        max_len = max(len(w) for w in MINIGRID_WORDS)
        chars = np.zeros((len(MINIGRID_WORDS) + 1, max_len), np.int32)
        lens = np.zeros((len(MINIGRID_WORDS) + 1,), np.int32)
        is_comma = np.zeros((len(MINIGRID_WORDS) + 1,), bool)
        for i, w in enumerate(MINIGRID_WORDS):
            lens[i + 1] = len(w)
            is_comma[i + 1] = w == ","
            for k, ch in enumerate(w):
                chars[i + 1, k] = 27 if ch == "," else (ord(ch) - ord("a"))
        self._chars = jnp.asarray(chars)
        self._lens = jnp.asarray(lens)
        self._is_comma = jnp.asarray(is_comma)
        self._max_word_len = max_len

    def _mission_char_onehot(self, mission):
        toks = mission_word_tokens(mission, self._tables)  # [max_words]
        lens = self._lens[toks]
        # Separator: one space before each word except the first and except
        # commas (which attach to the previous word in the raw string).
        nonpad = toks > 0
        sep = nonpad & ~self._is_comma[toks]
        sep = sep.at[0].set(False)
        starts = jnp.cumsum(lens + sep.astype(jnp.int32)) - lens
        # char_at[p]: which word covers output position p, and at what offset.
        L = self.max_str_len
        p = jnp.arange(L)
        # word w covers [starts[w], starts[w]+lens[w])
        in_word = (p[None, :] >= starts[:, None]) & (
            p[None, :] < (starts + lens)[:, None]
        ) & nonpad[:, None]
        word_idx = jnp.argmax(in_word, axis=0)
        covered = in_word.any(axis=0)
        offset = p - starts[word_idx]
        code = self._chars[toks[word_idx], jnp.clip(offset, 0, self._max_word_len - 1)]
        total = (starts + lens).max() * (nonpad.any()).astype(jnp.int32)
        # Uncovered positions below the string length are spaces (code 26);
        # beyond the string, all-zero rows (reference zero-inits the array
        # and only writes len(mission) rows).
        code = jnp.where(covered, code, 26)
        onehot = jax.nn.one_hot(code, self.NUM_CHAR_CODES, dtype=jnp.uint8)
        valid = (p < total)[:, None]
        return jnp.where(valid, onehot, 0)

    def observation(self, state):
        o = self.env.observation(state)
        image = o["image"].reshape(-1)
        mission = self._mission_char_onehot(state.mission).reshape(-1)
        return jnp.concatenate([image, mission]).astype(jnp.uint8)


class ViewSizeWrapper(Wrapper):
    """Re-render the symbolic obs at a different view size
    (reference: minigrid/wrappers.py:624-668).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import ViewSizeWrapper
        >>> env = ViewSizeWrapper(mg.make("MiniGrid-Empty-5x5-v0"), agent_view_size=5)
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape
        (5, 5, 3)
    """

    def __init__(self, env, agent_view_size: int = 7):
        super().__init__(env)
        assert agent_view_size % 2 == 1 and agent_view_size >= 3
        self.agent_view_size = agent_view_size

    def observation(self, state):
        o = self.env.observation(state)
        image = obs_lib.gen_obs_image(
            state, self.agent_view_size, self.env.see_through_walls
        )
        return {**o, "image": image}


class DirectionObsWrapper(Wrapper):
    """Adds the slope/angle toward the goal (reference:
    minigrid/wrappers.py:671-721, including its row-major index quirks).

    Deviation: the reference caches the goal position of the first episode
    forever; here it is recomputed per observation (identical for the
    static-goal envs this wrapper targets).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import DirectionObsWrapper
        >>> env = DirectionObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"), type="slope")
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["goal_direction"].shape
        ()
    """

    def __init__(self, env, type: str = "slope"):
        super().__init__(env)
        assert type in ("slope", "angle")
        self.type = type

    def observation(self, state):
        o = self.env.observation(state)
        w, h = state.grid.shape[:2]
        is_goal = cell_type(state.grid) == OBJ_GOAL
        # Reference flattens the row-major cell list and derives
        # (idx // height, idx % width) (minigrid/wrappers.py:697-706).
        xs = jnp.arange(w)[:, None]
        ys = jnp.arange(h)[None, :]
        ref_idx = ys * w + xs
        flat_idx = jnp.where(is_goal, ref_idx, w * h + 1).min()
        goal = jnp.stack([flat_idx // h, flat_idx % w])
        slope = (goal[1] - state.agent_y) / (goal[0] - state.agent_x)
        gd = jnp.arctan(slope) if self.type == "angle" else slope
        return {**o, "goal_direction": gd}


class SymbolicObsWrapper(Wrapper):
    """(x, y, object-idx) per cell, empty = -1, agent cell = agent idx
    (reference: minigrid/wrappers.py:724-770).

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> from minigrid_tpu.wrappers import SymbolicObsWrapper
        >>> env = SymbolicObsWrapper(mg.make("MiniGrid-Empty-5x5-v0"))
        >>> obs, _ = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape
        (5, 5, 3)
        >>> int(obs["image"][..., 2].min())
        -1
    """

    def observation(self, state):
        o = self.env.observation(state)
        w, h = state.grid.shape[:2]
        xs = jnp.broadcast_to(jnp.arange(w)[:, None], (w, h))
        ys = jnp.broadcast_to(jnp.arange(h)[None, :], (w, h))
        obj = cell_type(state.grid)
        obj = jnp.where(obj == OBJ_EMPTY, -1, obj)
        ax, ay = state.agent_x, state.agent_y
        obj = jnp.where((xs == ax) & (ys == ay), OBJ_AGENT, obj)
        image = jnp.stack([xs, ys, obj], axis=-1)
        return {**o, "image": image}

"""Structured mission encoding.

The reference carries the mission as a Python string sampled from a
``MissionSpace`` of templates (reference: minigrid/core/mission.py:14-117).
On device a mission is an int32[MISSION_DIM] vector: slot 0 is a globally
registered template id, the remaining slots are template parameters (color /
object-type / coordinate indices).  ``mission_to_text`` reproduces the exact
reference string on the host for API parity and language wrappers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from minigrid_tpu.core.constants import IDX_TO_COLOR, IDX_TO_OBJECT
from minigrid_tpu.core.state import MISSION_DIM

# Parameter kinds understood by the formatter.
PARAM_COLOR = "color"
PARAM_TYPE = "type"
PARAM_INT = "int"

_TEMPLATES: list[tuple[str, tuple[str, ...]]] = []
_TEMPLATE_IDS: dict[tuple[str, tuple[str, ...]], int] = {}


def register_mission(template: str, params: tuple[str, ...] = ()) -> int:
    """Register a mission template; returns its stable global id.

    ``template`` is a ``str.format`` string with positional slots, e.g.
    ``"go get a {0} {1}"`` with params ("color", "type").
    """
    key = (template, tuple(params))
    if key in _TEMPLATE_IDS:
        return _TEMPLATE_IDS[key]
    tid = len(_TEMPLATES)
    _TEMPLATES.append(key)
    _TEMPLATE_IDS[key] = tid
    return tid


def mission_vec(template_id: int, *params) -> jnp.ndarray:
    """Build an int32[MISSION_DIM] mission vector (traced params allowed)."""
    slots = [jnp.asarray(template_id, jnp.int32)]
    slots += [jnp.asarray(p, jnp.int32) for p in params]
    assert len(slots) <= MISSION_DIM
    vec = jnp.zeros((MISSION_DIM,), jnp.int32)
    for i, s in enumerate(slots):
        vec = vec.at[i].set(s)
    return vec


def _format_param(kind: str, value: int) -> str:
    if kind == PARAM_COLOR:
        return IDX_TO_COLOR[int(value)]
    if kind == PARAM_TYPE:
        return IDX_TO_OBJECT[int(value)]
    return str(int(value))


def mission_to_text(mission) -> str:
    """Host-side: render a mission vector to its reference string."""
    m = np.asarray(mission)
    template, kinds = _TEMPLATES[int(m[0])]
    args = [_format_param(k, m[1 + i]) for i, k in enumerate(kinds)]
    return template.format(*args)


def num_templates() -> int:
    return len(_TEMPLATES)


# -- Word-token machinery for language wrappers ------------------------------
# The reference's fixed Minigrid vocabulary
# (minigrid/wrappers.py:471-530): colors + objects + verbs + extra words.
MINIGRID_WORDS = (
    ["red", "green", "blue", "yellow", "purple", "grey"]
    + [
        "unseen", "empty", "wall", "floor", "box", "key", "ball", "door",
        "goal", "agent", "lava",
    ]
    + [
        "pick", "avoid", "get", "find", "put", "use", "open", "go", "fetch",
        "reach", "unlock", "traverse",
    ]
    + [
        "up", "the", "a", "at", ",", "square", "and", "then", "to", "of",
        "rooms", "near", "opening", "must", "you", "matching", "end",
        "hallway", "object", "from", "room", "maze",
    ]
)
WORD_TO_IDX = {w: i for i, w in enumerate(MINIGRID_WORDS)}


def _template_words(template: str) -> list[str | int]:
    """Split a template into vocabulary words and int param-slot markers.

    Commas are separate tokens (reference string_to_indices,
    minigrid/wrappers.py:532-544 adds spaces around commas)."""
    out: list[str | int] = []
    for piece in template.replace(",", " , ").split():
        if piece.startswith("{") and piece.endswith("}"):
            out.append(int(piece[1:-1]))
        else:
            out.append(piece)
    return out


def build_token_tables(max_words: int = 50):
    """Device tables for mission-vector -> word-index conversion.

    Returns dict with:
      * tokens: int32[T, max_words] — word_idx+1 entries, 0 padding, and
        -(slot+1) sentinels for parameter slots
      * slot_kind: int32[T, max_slots] — 0 color / 1 type / 2 int
      * color_words / type_words: int32 lookup of word_idx+1 per param value
    """
    import numpy as np

    T = len(_TEMPLATES)
    max_slots = MISSION_DIM - 1
    tokens = np.zeros((T, max_words), np.int32)
    slot_kind = np.zeros((T, max_slots), np.int32)
    for t, (template, kinds) in enumerate(_TEMPLATES):
        for s, kind in enumerate(kinds):
            slot_kind[t, s] = {PARAM_COLOR: 0, PARAM_TYPE: 1, PARAM_INT: 2}[kind]
        for w, piece in enumerate(_template_words(template)):
            if isinstance(piece, int):
                tokens[t, w] = -(piece + 1)
            else:
                tokens[t, w] = WORD_TO_IDX[piece] + 1
    color_words = np.array(
        [WORD_TO_IDX[IDX_TO_COLOR[c]] + 1 for c in range(6)], np.int32
    )
    type_words = np.array(
        [WORD_TO_IDX.get(IDX_TO_OBJECT[o], -1) + 1 for o in range(11)], np.int32
    )
    return {
        "tokens": jnp.asarray(tokens),
        "slot_kind": jnp.asarray(slot_kind),
        "color_words": jnp.asarray(color_words),
        "type_words": jnp.asarray(type_words),
    }


def mission_word_tokens(mission: jnp.ndarray, tables) -> jnp.ndarray:
    """int32[max_words] word indices (+1 offset, 0 pad) for a mission vector —
    the reference's string_to_indices output (minigrid/wrappers.py:546-550)."""
    toks = tables["tokens"][mission[0]]
    max_slots = MISSION_DIM - 1
    for s in range(max_slots):
        kind = tables["slot_kind"][mission[0], s]
        p = mission[1 + s]
        word = jnp.where(
            kind == 0,
            tables["color_words"][jnp.clip(p, 0, 5)],
            tables["type_words"][jnp.clip(p, 0, 10)],
        )
        toks = jnp.where(toks == -(s + 1), word, toks)
    return toks


class MissionSpace:
    """Host-side space of templated mission strings — the reference's public
    ``MissionSpace`` API (reference: minigrid/core/mission.py:14-199).

    ``mission_func`` maps one value per placeholder list to a mission string;
    ``ordered_placeholders`` is a list of candidate-string lists (or None for
    a constant mission).  ``sample`` draws placeholder values uniformly;
    ``contains`` re-parses a string against every placeholder combination the
    same greedy way the reference does.
    """

    def __init__(self, mission_func, ordered_placeholders=None, seed=None):
        if ordered_placeholders is not None:
            assert len(ordered_placeholders) == mission_func.__code__.co_argcount, (
                "the number of placeholder lists must equal the number of "
                "mission_func parameters"
            )
            for placeholder_list in ordered_placeholders:
                assert len(placeholder_list) == len(set(placeholder_list)), (
                    f"duplicate placeholders in {placeholder_list}"
                )
        self.mission_func = mission_func
        self.ordered_placeholders = ordered_placeholders
        self._rng = np.random.default_rng(seed)

    def seed(self, seed=None):
        self._rng = np.random.default_rng(seed)

    def sample(self) -> str:
        if self.ordered_placeholders is None:
            return self.mission_func()
        picks = [
            placeholders[self._rng.integers(0, len(placeholders))]
            for placeholders in self.ordered_placeholders
        ]
        return self.mission_func(*picks)

    def contains(self, x) -> bool:
        """Whether ``x`` is producible by this space (reference
        mission.py:80-168: positional scan over placeholder occurrences)."""
        if not isinstance(x, str):
            return False
        if self.ordered_placeholders is None:
            return x == self.mission_func()

        # Find every placeholder's occurrence positions in the template when
        # instantiated with each candidate value, mirroring the reference's
        # check-order logic: try all combinations and compare the result.
        from itertools import product as _product

        for combo in _product(*self.ordered_placeholders):
            if self.mission_func(*combo) == x:
                return True
        return False

    def __repr__(self):
        return f"MissionSpace({self.mission_func!r}, {self.ordered_placeholders!r})"

    def __eq__(self, other):
        if not isinstance(other, MissionSpace):
            return False
        if (self.ordered_placeholders is None) != (other.ordered_placeholders is None):
            return False
        if self.ordered_placeholders is None:
            return self.mission_func() == other.mission_func()
        if list(map(tuple, self.ordered_placeholders)) != list(
            map(tuple, other.ordered_placeholders)
        ):
            return False
        probe = [p[0] for p in self.ordered_placeholders]
        return self.mission_func(*probe) == other.mission_func(*probe)


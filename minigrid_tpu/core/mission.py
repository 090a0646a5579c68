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

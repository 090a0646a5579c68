"""String-id environment registry.

Mirrors the reference's gymnasium registration table
(reference: minigrid/__init__.py:24-1135) with plain construction — ids map
to (env class, kwargs).
"""

from __future__ import annotations

from typing import Any, Callable

_REGISTRY: dict[str, tuple[Callable, dict[str, Any]]] = {}


def register(env_id: str, cls: Callable, **kwargs: Any) -> None:
    if env_id in _REGISTRY:
        raise ValueError(f"duplicate env id: {env_id}")
    _REGISTRY[env_id] = (cls, kwargs)


def make(env_id: str, **overrides: Any):
    """Instantiate a registered environment, applying kwarg overrides.

    Example:
        >>> import jax
        >>> import minigrid_tpu as mg
        >>> env = mg.make("MiniGrid-DoorKey-5x5-v0")
        >>> obs, state = env.reset(jax.random.PRNGKey(0))
        >>> obs["image"].shape
        (7, 7, 3)
        >>> obs, state, reward, term, trunc = env.step(state, 2)  # forward
        >>> float(reward)
        0.0
    """
    if env_id not in _REGISTRY:
        raise KeyError(
            f"unknown env id {env_id!r}; see minigrid_tpu.registry.registered_ids()"
        )
    cls, kwargs = _REGISTRY[env_id]
    merged = dict(kwargs)
    merged.update(overrides)
    env = cls(**merged)
    # Stamp the id so config tables keyed by registry id (e.g.
    # parallel/reset_budget) can resolve it from the instance.
    env.env_id = env_id
    return env


def registered_ids() -> list[str]:
    return sorted(_REGISTRY)


def registry_entry(env_id: str):
    return _REGISTRY[env_id]

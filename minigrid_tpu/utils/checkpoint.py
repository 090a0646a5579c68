"""Checkpoint / resume for env-state and learner pytrees.

The reference has no checkpointing (nothing long-running; reproducibility is
seeds + pickling, reference: tests/test_envs.py:174-184).  Here episode state
is a pytree of dense arrays, so checkpointing is a first-class feature
(SURVEY.md §5.4): any ``EnvState`` batch, PPO ``TrainState``, or arbitrary
pytree round-trips through orbax (preferred, async-capable, sharding-aware)
or a plain ``.npz`` fallback with identical semantics.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [jax.tree_util.keystr(k) for k, _ in flat]
    leaves = [v for _, v in flat]
    return paths, leaves, treedef


def save_npz(path: str, tree: Any) -> None:
    """Write a pytree of arrays to one ``.npz`` file (host-side copy)."""
    paths, leaves, _ = _flatten_with_paths(tree)
    np.savez_compressed(path, **{p: np.asarray(v) for p, v in zip(paths, leaves)})


def load_npz(path: str, like: Any) -> Any:
    """Restore a pytree saved by :func:`save_npz`; ``like`` supplies the
    structure (leaf values are replaced)."""
    with np.load(path) as z:
        paths, leaves, treedef = _flatten_with_paths(like)
        missing = [p for p in paths if p not in z.files]
        if missing:
            raise KeyError(f"checkpoint {path} missing leaves: {missing}")
        restored = [
            jax.numpy.asarray(z[p], dtype=old.dtype)
            for p, old in zip(paths, leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, restored)


def save(path: str, tree: Any) -> None:
    """Checkpoint ``tree`` at ``path``.

    Uses orbax when available (directory checkpoint, preserves shardings on
    restore-to-device); otherwise falls back to ``<path>.npz``.
    """
    try:
        import orbax.checkpoint as ocp
    except ImportError:
        save_npz(path + ".npz", tree)
        return
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load(path: str, like: Any) -> Any:
    """Restore a checkpoint written by :func:`save`."""
    npz = path + ".npz"
    if os.path.exists(npz):
        return load_npz(npz, like)
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=like)
    return restored

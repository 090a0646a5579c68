"""Generate per-family demo GIFs from random-policy rollouts.

TPU-native counterpart of the reference docs pipeline's GIF generator
(reference: docs/_scripts/gen_gifs.py): one representative environment per
family is rolled out with random actions and rendered through the
tile-atlas renderer into ``docs/_static/videos/<Family>.gif``.

Usage:  python tools/gen_gifs.py [--families N] [--frames N]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", "cpu"))
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import minigrid_tpu as mg  # noqa: E402
from minigrid_tpu.registry import registered_ids  # noqa: E402

_CAMEL = re.compile(r"(?<!^)(?=[A-Z])")


def family_of(env_id: str) -> str:
    """Family key: the env-id segment without size/count suffixes."""
    name = env_id.split("-")[1]
    return name


def representative_ids():
    """One id per family, first registered wins (mirrors the reference's
    de-duplication of sized variants)."""
    seen, out = set(), []
    for env_id in registered_ids():
        fam = family_of(env_id)
        if fam in seen:
            continue
        seen.add(fam)
        out.append((fam, env_id))
    return out


def record_gif(env_id: str, path: str, frames: int = 60, seed: int = 0) -> bool:
    try:
        import imageio
    except ImportError:
        print("imageio unavailable; skipping", env_id)
        return False

    env = mg.make(env_id)
    key = jax.random.PRNGKey(seed)
    k_reset, k_act = jax.random.split(key)
    _, state = env.reset(k_reset)
    frame_fn = jax.jit(lambda s: env.get_frame(s, tile_size=16))
    step_fn = jax.jit(env.step)

    images = [np.asarray(frame_fn(state))]
    for t in range(frames - 1):
        k_act, k = jax.random.split(k_act)
        action = jax.random.randint(k, (), 0, env.num_actions, dtype=jnp.int32)
        _, state, *_ = step_fn(state, action)
        images.append(np.asarray(frame_fn(state)))
    imageio.mimsave(path, images, duration=0.1, loop=0)
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=int, default=0, help="limit (0 = all)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--skip-existing", action="store_true")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "docs", "_static", "videos"),
    )
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    reps = representative_ids()
    if args.families:
        reps = reps[: args.families]
    for fam, env_id in reps:
        path = os.path.join(args.out, f"{fam}.gif")
        if args.skip_existing and os.path.exists(path):
            continue
        if record_gif(env_id, path, frames=args.frames):
            print(f"{fam:28s} <- {env_id}  ({os.path.getsize(path)//1024} KiB)")


if __name__ == "__main__":
    main()

"""Measure per-env episodes-per-chunk to size the reset cache honestly.

For each tracked bench config this chains several data-dependent random
chunks under the TRUE reference reset semantics (fresh level per episode
end, no cache) and reports the
per-env episodes-finished-per-chunk distribution.  The maximum feeds
parallel/reset_budget.MEASURED_MAX_EPISODES_256 — the single source of
truth for covering R (see that module's docstring for the contract).

Run on the TPU machine:

    python tools/measure_reset_budget.py                 # all bench configs
    python tools/measure_reset_budget.py --env BabyAI-GoToLocal-v0 --num-envs 16384

"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minigrid_tpu.utils.compile_cache import enable_compile_cache  # noqa: E402

enable_compile_cache()

# (env id, num_envs) — bench.py's TRACKED configs that use a reset cache.
CONFIGS = (
    ("MiniGrid-Empty-Random-5x5-v0", 65536),
    ("MiniGrid-FourRooms-v0", 65536),
    ("MiniGrid-DoorKey-8x8-v0", 65536),
    ("MiniGrid-LavaCrossingS9N2-v0", 65536),
    ("MiniGrid-Dynamic-Obstacles-8x8-v0", 65536),
    ("BabyAI-GoToLocal-v0", 16384),
    ("MiniGrid-ObstructedMaze-2Dlh-v0", 8192),
    ("BabyAI-GoTo-v0", 16384),
)


def measure(env_id: str, num_envs: int, num_steps: int, chunks: int):
    """Per-env episodes-per-chunk distribution under the TRUE reference
    reset semantics: ``env.step``'s fused auto-reset generates a fresh level
    per episode end (no cache, so nothing clips and nothing replays); the
    per-env done counts ARE the slot counts a cached run would consume."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    import minigrid_tpu as mg

    env = mg.make(env_id)
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(k1, num_envs))
    step_batch = jax.vmap(env.step)

    @jax.jit
    def run(states, key):
        def chunk(c, _):
            st, kk = c

            def body(cc, _):
                st, kk, cnt = cc
                kk, ka = jax.random.split(kk)
                a = jax.random.randint(
                    ka, (num_envs,), 0, env.num_actions, jnp.int32
                )
                _, st, _, term, trunc = step_batch(st, a)
                return (st, kk, cnt + (term | trunc).astype(jnp.int32)), None

            (st, kk, cnt), _ = jax.lax.scan(
                body,
                (st, kk, jnp.zeros((num_envs,), jnp.int32)),
                None,
                length=num_steps,
            )
            return (st, kk), cnt

        (st, _), counts = jax.lax.scan(chunk, (states, key), None, length=chunks)
        return counts  # [chunks, num_envs]

    counts = np.asarray(run(states, k2))
    per_chunk_max = counts.max(axis=1).tolist()
    return {
        "env_id": env_id,
        "num_envs": num_envs,
        "num_steps": num_steps,
        "per_chunk_max": [int(m) for m in per_chunk_max],
        "max": int(counts.max()),
        "p999": float(np.quantile(counts, 0.999)),
        "mean_episodes_per_chunk": round(float(counts.mean()), 2),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--env", default=None)
    ap.add_argument("--num-envs", type=int, default=65536)
    ap.add_argument("--num-steps", type=int, default=256)
    ap.add_argument("--chunks", type=int, default=8)
    args = ap.parse_args()

    configs = (
        [(args.env, args.num_envs)] if args.env else list(CONFIGS)
    )
    for env_id, n in configs:
        try:
            out = measure(env_id, n, args.num_steps, args.chunks)
        except Exception as exc:  # report and continue the sweep
            out = {"env_id": env_id, "error": repr(exc)}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Per-env benchmark CLI (reference: minigrid/benchmark.py:13-132).

Measures, for one env id:
  * reset latency (ms/reset, host-visible, including device sync),
  * world-render FPS (full-grid RGB frames),
  * agent-view FPS (partial-obs RGB frames, the reference's step proxy),
  * batched env-steps/s (TPU-native metric with no reference analogue —
    vmap'd random-policy stepping, the number that actually matters here).

Usage::

    python -m minigrid_tpu.benchmark --env-id MiniGrid-Empty-8x8-v0
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp


def benchmark(
    env_id: str,
    num_resets: int = 200,
    num_frames: int = 200,
    tile_size: int = 32,
    num_envs: int = 4096,
    num_steps: int = 128,
) -> dict:
    from minigrid_tpu.parallel.vector import rollout_random
    from minigrid_tpu.registry import make

    env = make(env_id)
    key = jax.random.PRNGKey(0)

    # -- reset latency (jitted generator, new key each call) --
    reset = jax.jit(env.reset)
    _, state = reset(key)
    jax.block_until_ready(state.grid)
    t0 = time.perf_counter()
    for i in range(num_resets):
        _, state = reset(jax.random.fold_in(key, i))
    jax.block_until_ready(state.grid)
    reset_ms = (time.perf_counter() - t0) * 1e3 / num_resets

    # -- world render FPS --
    frame = jax.jit(
        lambda s: env.get_frame(s, highlight=True, tile_size=tile_size)
    )
    img = frame(state)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(num_frames):
        img = frame(state)
    jax.block_until_ready(img)
    world_fps = num_frames / (time.perf_counter() - t0)

    # -- agent-view FPS (render POV each step like the reference's
    #    RGBImgPartialObsWrapper loop, minigrid/benchmark.py:31-43) --
    pov = jax.jit(
        lambda s: env.get_frame(s, tile_size=tile_size, agent_pov=True)
    )
    img = pov(state)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(num_frames):
        img = pov(state)
    jax.block_until_ready(img)
    pov_fps = num_frames / (time.perf_counter() - t0)

    # -- batched step throughput --
    _, states = jax.jit(jax.vmap(env.reset))(jax.random.split(key, num_envs))
    states, _, _, _ = rollout_random(env, states, key, num_steps)  # compile
    jax.block_until_ready(states.step_count)
    t0 = time.perf_counter()
    states, _, _, _ = rollout_random(env, states, jax.random.fold_in(key, 1), num_steps)
    jax.block_until_ready(states.step_count)
    steps_per_sec = num_envs * num_steps / (time.perf_counter() - t0)

    results = {
        "env_id": env_id,
        "reset_ms": reset_ms,
        "world_render_fps": world_fps,
        "agent_view_fps": pov_fps,
        "env_steps_per_sec": steps_per_sec,
    }
    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--env-id", default="MiniGrid-LavaGapS7-v0")
    p.add_argument("--num-resets", type=int, default=200)
    p.add_argument("--num-frames", type=int, default=200)
    p.add_argument("--tile-size", type=int, default=32)
    p.add_argument("--num-envs", type=int, default=4096)
    p.add_argument("--num-steps", type=int, default=128)
    args = p.parse_args(argv)
    r = benchmark(
        args.env_id,
        num_resets=args.num_resets,
        num_frames=args.num_frames,
        tile_size=args.tile_size,
        num_envs=args.num_envs,
        num_steps=args.num_steps,
    )
    print(f"env_id: {r['env_id']}")
    print(f"reset time: {r['reset_ms']:.2f} ms")
    print(f"world render FPS: {r['world_render_fps']:.0f}")
    print(f"agent view FPS: {r['agent_view_fps']:.0f}")
    print(f"batched env-steps/s ({args.num_envs} envs): {r['env_steps_per_sec']:.0f}")
    return r


if __name__ == "__main__":
    main()

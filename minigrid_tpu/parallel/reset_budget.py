"""Covering sizes for the per-chunk reset cache (honest iid-reset semantics).

The reference's ``reset()`` generates a FRESH level on every episode end,
unconditionally (reference: minigrid/minigrid_env.py:119-143).  The batched
rollout paths amortize generation with a per-chunk cache of R pre-generated
levels per env (core/env.py ``step_cached``; ops/fused_rollout.py;
ops/actor_rollout.py): the r-th episode end within a chunk consumes slot r.
That is distribution-identical to the reference's iid-reset stream exactly
when no env finishes more than R episodes in one chunk — past that the last
slot is replayed, a level stream the reference never produces.

This module is the single source of truth for covering R:

* ``deterministic_generation`` families (fixed-start Empty, DistShift) need
  R=1: every fresh level is identical, so replay IS the reference
  distribution — exempt by construction.
* Everything else sizes R from the MEASURED per-env episode-count
  distribution under the config's policy (tools/measure_reset_budget.py —
  the chained steady-state max over every env of a full-scale run), with a
  >=2x margin on the observed maximum.
* Consumers must still CHECK: the rollout paths return the consumed-slot
  counter (``max_used``); bench.py / tools/profiler.py assert
  ``max_used <= R`` on the very runs whose numbers they publish, and the
  learners surface ``max_episodes_per_chunk`` in their metrics dict — an
  exhausted cache is loud, never silent.
"""

from __future__ import annotations

import math

# Measured maximum episodes finished by ANY env in one 256-step chunk under
# a uniform-random policy with TRUE fresh-per-reset semantics, chained
# steady state — tools/measure_reset_budget.py on the TPU v5e, 8 chained
# chunks at the bench config's env count (round 5; per-chunk maxima and
# p99.9 in that run's output).  Keys are registry ids; values the observed
# p100.  Families whose fused kernels regenerate in-kernel
# (ext.covers_reset: Dynamic-Obstacles, Empty-Random) keep entries for the
# XLA cached fallback path only.
MEASURED_MAX_EPISODES_256: dict[str, int] = {
    "MiniGrid-Empty-Random-5x5-v0": 12,  # 65536 envs; mean 3.58, p999 8
    "MiniGrid-FourRooms-v0": 5,  # 65536 envs; mean 2.55 (max_steps=100)
    "MiniGrid-DoorKey-8x8-v0": 2,  # 65536 envs; mean 0.38 (max_steps=640)
    "MiniGrid-LavaCrossingS9N2-v0": 18,  # 65536 envs; mean 3.68, p999 12
    "MiniGrid-Dynamic-Obstacles-8x8-v0": 37,  # 65536 envs; mean 14.28
    "BabyAI-GoToLocal-v0": 11,  # 16384 envs; mean 4.67 (truncates at 64)
    "MiniGrid-ObstructedMaze-2Dlh-v0": 2,  # 8192 envs; mean 0.38
    # Measured max 3 at 256 envs x 2 chunks (the full-scale per-step-generate
    # probe overloads the worker; mean 0.12 — dynamic per-mission max_steps
    # puts a short-truncation tail under the 576 headline window).  Entered
    # as 5 for the unmeasured full-scale tail; the bench assert still
    # certifies the published run.
    "BabyAI-GoTo-v0": 5,
}

# Conservative fallback for ids without a measured entry: assume an episode
# can end every ``num_steps/8`` steps plus slack.  This intentionally
# over-provisions; measure and add an entry for any hot config.
_FALLBACK_EPISODES_256 = 8

# Measured MEAN episodes per env per 256-step chunk (same runs as the p100
# table above).  Sizes the SHARED reset pool of the XLA cached path
# (parallel/vector.make_pool_stepper): levels there are drawn in global
# episode order, so the pool only needs to cover the AGGREGATE episode count
# — num_envs * mean — not num_envs * per-env-max.  On rare-reset families
# the gap is enormous (BabyAI-GoTo: mean 0.12 vs covering R=7 → 40x less
# generation for the same replay-free iid contract).
MEASURED_MEAN_EPISODES_256: dict[str, float] = {
    "MiniGrid-Empty-Random-5x5-v0": 3.58,
    "MiniGrid-FourRooms-v0": 2.55,
    "MiniGrid-DoorKey-8x8-v0": 0.38,
    "MiniGrid-LavaCrossingS9N2-v0": 3.68,
    "MiniGrid-Dynamic-Obstacles-8x8-v0": 14.28,
    "BabyAI-GoToLocal-v0": 4.67,
    "MiniGrid-ObstructedMaze-2Dlh-v0": 0.38,
    # The 256-env 2-chunk probe read 0.12, but it started phase-aligned from
    # reset: GoTo's dynamic per-mission max_steps sits just above the
    # 256-step chunk, so the first chunks see almost no truncations.  The
    # full-scale chained certification measured 15516 consumed rows in one
    # 16384-env chunk (0.95/env steady state) — entered as 1.0.
    "BabyAI-GoTo-v0": 1.0,
}


def pool_size(env, num_steps: int, num_envs: int, env_id: str | None = None) -> int:
    """Shared-pool capacity covering the aggregate episode count of one
    ``num_envs`` x ``num_steps`` chunk.

    Sized from the measured mean episode rate with a 30% multiplicative
    margin plus a 6-sigma binomial term (aggregate counts concentrate at
    sqrt(aggregate) scale over >=2^13 envs) — generous, because exhaustion
    is ASSERTED (``assert_chain_covered``), never silently replayed.  Ids
    without a measured mean fall back to the per-env covering R (no worse
    than the per-env-slot cache).
    """
    if env_id is None:
        env_id = getattr(env, "env_id", None)
    mean = MEASURED_MEAN_EPISODES_256.get(env_id)
    if mean is None:
        return num_envs * resets_for(env, num_steps, env_id)
    agg = num_envs * mean * max(num_steps, 1) / 256
    return int(math.ceil(agg * 1.3 + 6 * math.sqrt(agg + 1) + 64))


def covering_resets(measured_max: int, num_steps: int) -> int:
    """Covering R for a chunk of ``num_steps`` given the measured per-256-step
    episode maximum: scale to the chunk length, then add a 25% + 2 margin.
    The margin can be modest because exhaustion is ASSERTED, never silent
    (``assert_chain_covered`` below): an undersized R fails the bench loudly
    instead of replaying levels, while every extra slot costs real level
    generation per env per chunk (the honest price of the iid contract) and
    kernel VMEM."""
    scaled = math.ceil(measured_max * max(num_steps, 1) / 256)
    return scaled + max(math.ceil(scaled / 4), 2)


def resets_for(env, num_steps: int, env_id: str | None = None) -> int:
    """Covering resets-per-chunk for ``env`` over a ``num_steps`` chunk.

    ``env_id`` defaults to the id ``minigrid_tpu.make`` stamped on the
    instance.  Families flagged ``deterministic_generation`` return 1.
    """
    if getattr(env, "deterministic_generation", False):
        return 1
    if env_id is None:
        env_id = getattr(env, "env_id", None)
    measured = MEASURED_MAX_EPISODES_256.get(env_id)
    if measured is None:
        # Episodes cannot outnumber truncation windows plus terminations;
        # bound the fallback by the truncation rate when max_steps is known.
        measured = _FALLBACK_EPISODES_256
    return covering_resets(measured, num_steps)


def assert_chain_covered(step, carry, resets: int, env, chunks: int = 8):
    """Certify a measured rollout chain replay-free: run ``chunks`` chained
    calls of ``step`` (``carry -> (carry, live)`` with the consumed-slot
    maximum as the LAST element of ``live``) and assert no chunk consumed
    more than ``resets`` cache slots.  ``deterministic_generation`` families
    are exempt (replay is the reference distribution for them).  Returns the
    observed maximum.  bench.py / tools/profiler.py call this on the same
    jitted step they time, so every published number is certified on-device.
    """
    if getattr(env, "deterministic_generation", False):
        return 0
    import jax

    @jax.jit
    def run(c):
        def body(cc, _):
            cc, live = step(cc)
            return cc, jax.tree.leaves(live)[-1]

        _, mus = jax.lax.scan(body, c, None, length=chunks)
        return mus.max()

    observed = int(run(carry))
    assert observed <= resets, (
        f"reset cache exhausted: an env consumed {observed} slots in one "
        f"chunk but R={resets} — the published number would include sticky "
        f"level replay the reference's reset contract forbids.  Raise the "
        f"entry in reset_budget.MEASURED_MAX_EPISODES_256 for this config."
    )
    return observed
